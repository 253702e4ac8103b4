"""Summarize a jax.profiler trace: top device ops by total self time.

Usage: python scratch/parse_trace.py /tmp/enc_trace [n_iters]
"""
import collections
import glob
import gzip
import json
import sys

root = sys.argv[1]
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
paths = sorted(glob.glob(f"{root}/**/*.trace.json.gz", recursive=True))
assert paths, f"no trace.json.gz under {root}"
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
# find device-side tracks (TPU / device compute lanes)
pid_names = {}
tid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower() or "Device" in n}
print("processes:", {p: n for p, n in pid_names.items()}, file=sys.stderr)

tot = collections.Counter()
cnt = collections.Counter()
track_tot = collections.Counter()
for e in events:
    if e.get("ph") != "X":
        continue
    pid = e.get("pid")
    if dev_pids and pid not in dev_pids:
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0)
    tname = tid_names.get((pid, e.get("tid")), str(e.get("tid")))
    if "step" in tname.lower():
        continue
    tot[name] += dur
    cnt[name] += 1
    track_tot[tname] += dur

print(f"\ntracks (us/iter over {iters} iters):")
for t, d in track_tot.most_common(12):
    print(f"  {d/iters:12.0f}  {t}")

print("\ntop ops by total self time (us/iter):")
for name, d in tot.most_common(400):
    print(f"  {d/iters:10.0f}  x{cnt[name]//iters:<5d} {name[:110]}")
