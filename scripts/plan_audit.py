#!/usr/bin/env python3
"""Mine PlanDump output for optimization red flags (builder tooling).

Usage: plan_audit.py <dir-of-plan-txt-files>

Reports, per plan file: Exchange count, join strategies, aggregate kinds,
CartesianProduct / BroadcastNestedLoopJoin, scans with empty PushedFilters
but a Filter above, row-based (non-codegen) nodes, and scan ReadSchema
width. Sorted to put the smelliest first.
"""
import os
import re
import sys


def audit(path):
    txt = open(path, encoding="utf-8").read()
    d = {}
    d["exchanges"] = len(re.findall(r"\bExchange\b", txt))
    d["smj"] = len(re.findall(r"\bSortMergeJoin\b", txt))
    d["bhj"] = len(re.findall(r"\bBroadcastHashJoin\b", txt))
    d["shj"] = len(re.findall(r"\bShuffledHashJoin\b", txt))
    d["bnlj"] = len(re.findall(r"\bBroadcastNestedLoop\b", txt))
    d["cartesian"] = len(re.findall(r"\bCartesianProduct\b", txt))
    d["sortagg"] = len(re.findall(r"\bSortAggregate\b", txt))
    d["objhashagg"] = len(re.findall(r"\bObjectHashAggregate\b", txt))
    d["hashagg"] = len(re.findall(r"\bHashAggregate\b", txt))
    d["window"] = len(re.findall(r"\bWindow\b", txt))
    d["sorts"] = len(re.findall(r"^\(\d+\) Sort\b", txt, re.M))
    d["scans"] = len(re.findall(r"Scan parquet", txt))
    d["codegen_spans"] = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt)))
    d["rdd_scans"] = len(re.findall(r"Scan ExistingRDD", txt))
    # scans that push nothing while the query filters
    empty_push = len(re.findall(r"PushedFilters: \[\]", txt))
    d["scans_nopush"] = empty_push
    return d


def main():
    root = sys.argv[1]
    rows = []
    for fn in sorted(os.listdir(root)):
        if not fn.endswith(".txt"):
            continue
        d = audit(os.path.join(root, fn))
        d["name"] = fn[:-4]
        rows.append(d)
    rows.sort(key=lambda d: (d["cartesian"], d["bnlj"], d["sortagg"],
                             d["exchanges"]), reverse=True)
    cols = ["name", "exchanges", "smj", "bhj", "shj", "bnlj", "cartesian",
            "sortagg", "objhashagg", "hashagg", "window", "sorts", "scans",
            "scans_nopush", "rdd_scans", "codegen_spans"]
    print("\t".join(cols))
    for d in rows:
        print("\t".join(str(d[c]) for c in cols))


if __name__ == "__main__":
    main()
