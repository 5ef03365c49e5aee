#!/usr/bin/env python3
"""FINAL-GATE checklist item (r20, VERDICT r19 minor 4b): diff the query
REGISTER (every `"q_..." -> ((` registration in the Scala sources)
against SURVEY.md's inventory mentions, so late-round rows cannot miss
the §7.4 table again (it happened in r18 AND r19).

The §2 parity-surface rows (q_transform_*, q_validate_*, q_lookup_*,
the scan/sink/pipeline plumbing) are tracked by VERDICT's §2 table, not
§7.4 — they are whitelisted here by exact name.  Exit 1 if any
EXTENSION row is registered but never mentioned in SURVEY.md."""
import re
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PARITY = {
    "q_auto_mapping", "q_events_asof_forward", "q_events_asof_nearest",
    "q_events_asof_tolerance", "q_filter_skip", "q_lookup_external_default",
    "q_lookup_external_null", "q_lookup_external_skip", "q_lookup_self",
    "q_pipeline_e2e", "q_rename_projection", "q_scan_projection",
    "q_schema_degrade", "q_sink_roundtrip", "q_sql_passthrough",
    "q_transform_capitalize", "q_transform_chain", "q_transform_insert",
    "q_transform_lower", "q_transform_strip", "q_transform_to_date",
    "q_transform_to_int", "q_transform_upper", "q_transform_ynbool",
    "q_validate_lookup_null", "q_validate_lookup_skip",
    "q_validate_null_bypass", "q_validate_range_default",
    "q_validate_range_gte", "q_validate_range_skip",
    "q_validate_regex_default", "q_validate_regex_error",
    "q_validate_regex_null", "q_validate_regex_skip", "q_where_pushdown",
    "q_yaml_compact",
}


def main():
    reg = set()
    for root, _, files in os.walk(os.path.join(REPO, "src/main/scala")):
        for f in files:
            if f.endswith(".scala"):
                src = open(os.path.join(root, f)).read()
                reg |= set(re.findall(r'"(q_[a-z0-9_]+)"\s*->\s*\(\(', src))
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    mentioned = set(re.findall(r"q_[a-z0-9_]+", survey))
    missing = sorted(reg - mentioned - PARITY)
    print(f"registered: {len(reg)}  parity-whitelisted: {len(PARITY & reg)}  "
          f"extension mentioned: {len((reg - PARITY) & mentioned)}  "
          f"MISSING: {len(missing)}")
    for m in missing:
        print("  MISSING from SURVEY:", m)
    sys.exit(1 if missing else 0)


if __name__ == "__main__":
    main()
