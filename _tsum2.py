import gzip, json, sys
from collections import defaultdict
with gzip.open(sys.argv[1], 'rt') as f:
    data = json.load(f)
ev = data.get("traceEvents", [])
seen = {}
for e in ev:
    if e.get("ph") == "X" and e["name"].startswith(("while.", "fusion.66", "iota_reduce")):
        if e["name"] not in seen and "args" in e:
            seen[e["name"]] = e["args"]
for n in ["while.1898","while.1910","while.1916","while.1934","while.1928","while.1922","while.1940","while.1904","while.1967","while.1976","while.1981","while.1996","fusion.6621","fusion.6622"]:
    print(n, "->", json.dumps(seen.get(n, {}))[:500])
