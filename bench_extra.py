"""Round-7 optimization harness (NOT the driver bench — bench.py is frozen).

Isolates single queries with the noop sink (guide §1.4), labels jobs
(§1.5), and dumps `.explain("formatted")` plans for the plan-diff evidence
in plans/r07/.

Usage:
  python bench_extra.py run q_dsir_importance [q_x ...] [--sf DIR] [--k N]
  python bench_extra.py explain q_dsir_importance [...] [--sf DIR] [--tag before]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _intelligent_document_ai_for_field_extraction_from_invoices_spark import (  # noqa: E402
    contract,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators import (  # noqa: E402
    dedup,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    args = sys.argv[1:]
    mode = args.pop(0) if args else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    k = 3
    tag = "before"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--k":
            k = int(next(it))
        elif a == "--tag":
            tag = next(it)
        else:
            names.append(a)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("bench-extra",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if mode == "explain":
        os.makedirs("plans/r07", exist_ok=True)
        for name in names:
            df = contract.QUERIES[name](spark, sf_dir)
            path = f"plans/r07/{name}_{tag}.txt"
            with open(path, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(  # noqa: SLF001
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))  # noqa: SLF001
            dedup.release_caches()
            contract._RESULTS_CACHE.clear()  # noqa: SLF001
            print("wrote", path)
        return

    out: dict[str, list[float]] = {}
    for _ in range(k):
        for name in names:
            q = contract.QUERIES[name]
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            dedup.release_caches()
    print(json.dumps({"sf_dir": sf_dir, "k": k, "samples": out,
                      "median": {n: sorted(v)[len(v) // 2]
                                 for n, v in out.items()}}))


if __name__ == "__main__":
    main()
