"""Parse a captured vm.trace.json.gz into a per-op time table (grouped by
op name prefix), robust to the broken tensorboard protobuf plugin."""
import gzip, json, sys, re
from collections import defaultdict

path = sys.argv[1]
with gzip.open(path, "rt") as f:
    tr = json.load(f)
ev = tr["traceEvents"]
# device-side complete events carry pid/tid of TensorCore lanes; host threads too.
# Identify device pids via process_name metadata containing "TPU" or "/device"
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "Chip" in n or "device" in n.lower()}
tot = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in ev:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3  # us -> ms
    # strip trailing numeric suffixes: fusion.123 -> fusion
    base = re.sub(r"[.\d]+$", "", name)
    args = e.get("args") or {}
    cat = args.get("hlo_category", "")
    key = (cat, base[:60])
    tot[key] += dur
    cnt[key] += 1
    total += dur
rows = sorted(tot.items(), key=lambda kv: -kv[1])
print(f"# device total {total:.1f} ms across {sum(cnt.values())} events  [{path}]")
print(f"# pids: { {p: names[p] for p in dev_pids} }")
for (cat, base), t in rows[:35]:
    print(f"{100*t/total:6.2f}%  {t:9.2f} ms  n={cnt[(cat,base)]:6d}  {cat:24s} {base}")
