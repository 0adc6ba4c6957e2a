"""Config-driven workflow runner — the geoclimate-cli analogue.

Reference: `java -jar geoclimate -w OSM -f config.json` parses a JSON config
(input / output / parameters) and drives the staged pipeline
(`/root/reference/geoclimate-cli/.../Geoclimate.groovy:86-138`,
`osm/.../WorkflowOSM.groovy:139-162` config extraction `:761`). Same shape
here: a JSON file names the input scale dir, the stages to run, output
location/format and parameters; the runner executes the resumable pipeline
(plans/pipeline.py) and exports requested tables (sources/sinks.py).

Run: ``spark-submit --py-files geoclimate_spark.zip -m geoclimate_spark.plans.workflow cfg.json``
or ``python -m geoclimate_spark.plans.workflow cfg.json``.

Config schema::

    {
      "input": {"sf_dir": "/root/testdata/sf0.001"},
      "run_dir": "/tmp/run1",            # snapshots + manifest live here
      "tile_res": 7,                      # optional parameter overrides
      "export": {"dir": "/tmp/out1", "format": "parquet",
                 "tables": ["zone_tile_agg"]},
      "resume": true
    }
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pyspark.sql import SparkSession

from ..sources.sinks import save_tables
from .pipeline import PipelineRunner, flagship_stages


def run_config(spark: SparkSession, config: dict) -> dict:
    """Execute the configured workflow; returns a small report dict
    (the reference's per-zone log-table analogue)."""
    sf_dir = config["input"]["sf_dir"]
    run_dir = config["run_dir"]
    tile_res = config.get("tile_res")
    runner = PipelineRunner(spark, run_dir,
                            flagship_stages(sf_dir, tile_res=tile_res))
    events: list[tuple[str, str]] = []
    outputs = runner.run(resume=config.get("resume", True),
                         on_stage=lambda n, how: events.append((n, how)))
    report = {"stages": events, "metrics": runner.metrics()}
    exp = config.get("export")
    if exp:
        wanted = {n: outputs[n] for n in exp.get("tables", outputs)}
        paths = save_tables(wanted, exp["dir"], fmt=exp.get("format", "parquet"))
        report["exported"] = paths
    return report


def main(argv: list[str]) -> int:
    cfg = json.loads(Path(argv[0]).read_text())
    spark = SparkSession.builder.getOrCreate()
    report = run_config(spark, cfg)
    print(json.dumps({"stages": report["stages"],
                      "exported": report.get("exported", {})}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
