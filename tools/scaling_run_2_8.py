"""One exclusive-window 2-vs-8-CPU scaling run at 2M pages, appended to
SCALING_2_8_2M_r4.jsonl (VERDICT r3 #7).  Run with nothing else active."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

rec = bench._scaling_pair(2, 8, os.environ.get("GRAFT_SCALING_ROWS_SMALL",
                                               "2000000"))
rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
rec["note"] = os.environ.get("SCALING_NOTE", "r4 exclusive window")
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "SCALING_2_8_2M_r4.jsonl")
with open(path, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
