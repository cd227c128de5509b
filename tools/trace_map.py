import re, collections, gzip, json, sys
hlo = open("/tmp/raster_hlo.txt").read()
# map op name -> (op_name metadata, source line)
meta = {}
for m in re.finditer(r'%(\S+?) = \S+ (\w+)\(.*?metadata=\{op_name="([^"]*)"(?: source_file="[^"]*" source_line=(\d+))?', hlo):
    meta[m.group(1)] = (m.group(3), m.group(4))
with gzip.open(sys.argv[1]) as f:
    data = json.load(f)
names = {}
for e in data["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
by_op = collections.Counter()
for e in data["traceEvents"]:
    if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
        by_op[e["name"]] += e["dur"]
frames = 10
tot = 0.0
for k, v in by_op.most_common(60):
    if k.startswith("jit_"): continue
    om, line = meta.get(k, ("?", None))
    tot += v
    print(f"{v/1e3/frames:8.2f} ms  {k:28s} {om[:80]} L{line}")
print(f"accounted {tot/1e3/frames:.1f} ms/frame")
