import gzip, json, sys
from collections import defaultdict
path = sys.argv[1]
with gzip.open(path, 'rt') as f:
    data = json.load(f)
ev = data.get("traceEvents", [])
# find process names
pids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
agg = defaultdict(float)
cnt = defaultdict(int)
for e in ev:
    if e.get("ph") == "X":
        pname = pids.get(e["pid"], "")
        if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
            agg[(pname, e["name"])] += e.get("dur", 0)
            cnt[(pname, e["name"])] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
tot = sum(agg.values())
print("pids:", set(pids.values()))
print(f"total device us: {tot:.0f}")
for (p, n), us in rows:
    print(f"{us/1e3:9.2f} ms  {100*us/tot:5.1f}%  x{cnt[(p,n)]:<4d} {n[:110]}")
