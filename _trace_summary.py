import gzip, json, sys, collections
path = sys.argv[1]
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
# find TPU op events: pid/tid names
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
by_op = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        pname = names.get(e.get("pid"), "")
        if "TPU" in pname or "xla" in pname.lower():
            tname = e.get("name", "")
            by_op[tname] += e["dur"]
            total += e["dur"]
print("process names:", set(names.values()))
for k, v in by_op.most_common(40):
    print(f"{v/1e3:10.2f} ms  {k[:120]}")
print(f"total {total/1e3:.1f} ms over trace")
