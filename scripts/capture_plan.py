"""Capture ``explain("formatted")`` for named queries into plans/<tag>/.

Usage: python scripts/capture_plan.py <tag-suffix> <query> [query...]
Writes plans/r17/<query>_<tag-suffix>.txt for each query (sf0.1).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.session import get_spark
from flink_wsr_project_spark.plans.registry import get

tag = sys.argv[1]
names = sys.argv[2:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(REPO, "plans", "r17")
os.makedirs(out_dir, exist_ok=True)

spark = get_spark("capture-plan")
for name in names:
    df = get(name).spark_fn(spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(path, len(plan.splitlines()), "lines")
