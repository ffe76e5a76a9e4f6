"""Time every declared query through the noop sink in one warm session.

Protocol (r16/r17 optimization rounds): one session, one warm-up query,
then each registry query once, labelled via setJobDescription, timed
around the noop write (guide §1.4/§1.5). Output JSON {name: sec|"ERR"}.

Usage: python scripts/time_all.py [out.json] [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_wsr_project_spark.session import get_spark
from flink_wsr_project_spark.plans.registry import all_queries

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/time_all.json"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

reg = all_queries()
spark = get_spark("timeall")
reg["pv_hourly"](spark, sf).write.format("noop").mode("overwrite").save()
out = {}
for name in sorted(reg):
    t0 = time.perf_counter()
    try:
        spark.sparkContext.setJobDescription(name)
        reg[name](spark, sf).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    except Exception as ex:
        out[name] = f"ERR {type(ex).__name__}"
    finally:
        spark.sparkContext.setJobDescription(None)
    print(name, out[name], flush=True)
json.dump(out, open(out_path, "w"))
print("total", round(sum(v for v in out.values() if isinstance(v, float)), 1))
