#!/usr/bin/env python3
"""Merge the 4 crash-isolated sf100 battery group JSONs (each a full
graft.Bench artifact over its query subset) into ONE battery artifact
with the same shape as tools/spark_battery_sf{1,10}.json, so graft.Bench
can embed it as `spark_battery_sf100`.

Usage: merge_battery_sf100.py <group.json>... <out.json>
"""
import json, sys

groups = [json.load(open(p)) for p in sys.argv[1:-1]]
out = {
    "metric": "total", "unit": "sec", "stat": groups[0]["stat"],
    "queries": {}, "queries_min": {}, "errors": [],
    "groups": len(groups),
    "note": ("sum of 4 crash-isolated single-JVM groups, same box, "
             "sequential, otherwise-idle; forked-JVM heap 96g "
             "(SPARK_DRIVER_MEM), table cache ON (the sf1/sf10 ladder "
             "methodology)"),
}
for g in groups:
    out["queries"].update(g["queries"])
    out["queries_min"].update(g.get("queries_min", {}))
    out["errors"].extend(g.get("errors", []))
out["value"] = sum(out["queries"].values())
out["total_min"] = sum(out["queries_min"].values()) or None
json.dump(out, open(sys.argv[-1], "w"), indent=1)
print(f"total med {out['value']:.1f} s / min {out['total_min']:.1f} s, "
      f"{len(out['queries'])} queries, errors={out['errors']}")
