import json, sys, subprocess
f = sys.argv[1]
p = subprocess.Popen(["zstd", "-dc", f], stdout=subprocess.PIPE, text=True)
jobs = {}; stages = []
gc_total = run_total = deser = fetch = 0
for line in p.stdout:
    try: ev = json.loads(line)
    except Exception: continue
    t = ev.get("Event")
    if t == "SparkListenerJobStart":
        jobs[ev["Job ID"]] = [ev["Submission Time"], None, len(ev.get("Stage IDs", []))]
    elif t == "SparkListenerJobEnd":
        if ev["Job ID"] in jobs: jobs[ev["Job ID"]][1] = ev["Completion Time"]
    elif t == "SparkListenerStageCompleted":
        si = ev["Stage Info"]
        if si.get("Submission Time") and si.get("Completion Time"):
            stages.append((si["Stage ID"], si["Stage Name"][:70], si["Completion Time"]-si["Submission Time"], si["Number of Tasks"]))
    elif t == "SparkListenerTaskEnd":
        m = ev.get("Task Metrics") or {}
        gc_total += m.get("JVM GC Time", 0)
        run_total += m.get("Executor Run Time", 0)
        deser += m.get("Executor Deserialize Time", 0)
        sr = m.get("Shuffle Read Metrics") or {}
        fetch += sr.get("Fetch Wait Time", 0)
print(f"task run total {run_total/1000:.1f}s  GC {gc_total/1000:.1f}s ({100*gc_total/max(run_total,1):.0f}%)  deser {deser/1000:.1f}s  fetchwait {fetch/1000:.1f}s")
jd = [(jid, (e-s)/1000 if e else None, nst) for jid, (s, e, nst) in sorted(jobs.items())]
print("slowest jobs:")
for jid, dur, nst in sorted(jd, key=lambda x: -(x[1] or 0))[:8]:
    print(f"  job {jid:3d} {dur:7.1f}s stages={nst}")
print("slowest stages:")
for sid, name, dur, nt in sorted(stages, key=lambda x: -x[2])[:12]:
    print(f"  stage {sid:3d} {dur/1000:7.1f}s tasks={nt} {name}")
ss=[s for s,e,n in jobs.values()]; ee=[e for s,e,n in jobs.values() if e]
print(f"jobs wall span {(max(ee)-min(ss))/1000:.1f}s; sum job dur {sum(x[1] for x in jd if x[1]):.1f}s; n_jobs {len(jd)}; n_stages {len(stages)}")
ends = sorted([(s, e) for s, e, n in jobs.values() if e])
gap = 0; prev = None
for s, e in ends:
    if prev is not None and s > prev: gap += s - prev
    prev = max(prev or e, e)
print(f"inter-job driver gaps total {gap/1000:.1f}s")
