import json, sys, subprocess, collections
f = sys.argv[1]
p = subprocess.Popen(["zstd", "-dc", f], stdout=subprocess.PIPE, text=True)
st = {}
sql_plans = []
for line in p.stdout:
    try: ev = json.loads(line)
    except Exception: continue
    t = ev.get("Event")
    if t == "SparkListenerStageCompleted":
        si = ev["Stage Info"]
        if si.get("Submission Time"):
            st.setdefault(si["Stage ID"], {})["wall"] = (si["Completion Time"]-si["Submission Time"])/1000
            st[si["Stage ID"]]["ntasks"] = si["Number of Tasks"]
            st[si["Stage ID"]]["name"] = si["Stage Name"][:45]
    elif t == "SparkListenerTaskEnd":
        sid = ev["Stage ID"]
        m = ev.get("Task Metrics") or {}
        d = st.setdefault(sid, {})
        d["task_ms"] = d.get("task_ms", 0) + m.get("Executor Run Time", 0)
        sr = m.get("Shuffle Read Metrics") or {}
        d["rows_in"] = d.get("rows_in", 0) + (sr.get("Total Records Read", 0) or 0)
for sid in sorted(st):
    d = st[sid]
    if d.get("task_ms", 0) > 3000:
        print(f"stage {sid:3d} wall {d.get('wall',0):7.1f}s tasksec {d.get('task_ms',0)/1000:8.1f} n={d.get('ntasks','?'):>3} shufrows {d.get('rows_in',0):>12,} {d.get('name','')}")
