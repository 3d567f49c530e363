#!/usr/bin/env python3
"""Min-merge a partial bench artifact into a round artifact (VERDICT
r15 #6a — the unclean-requery protocol): a contended run leaves some
queries without two provably-quiet reps; a later quiet window re-runs
JUST those (SPARK_GRAFT_ONLY=...) and this tool folds the partial
artifact back in.

Merge rules (contention only ever inflates, so these are conservative):
  - per-query time: min of the two runs' mins (ignoring failed -1 reps);
  - per-query clean count: max of the two runs' counts — a query with
    two clean reps in EITHER window is backed by a provably-quiet
    measurement;
  - `unclean`/`unclean_n`/`probe_ok`/`value` are recomputed from the
    merged maps; `merged_from` records provenance.

Artifacts without `clean_reps` (pre-r16) derive counts from their
`unclean` list (2 if absent from it, 0 if present).

Usage: python3 tools/bench_merge.py <round.json> <partial.json> <out.json>
"""
import json
import sys


def clean_map(art):
    if "clean_reps" in art:
        return dict(art["clean_reps"])
    unclean = set(art.get("unclean", []))
    return {q: (0 if q in unclean else 2) for q in art["queries"]}


def main():
    round_path, partial_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    rnd = json.load(open(round_path))
    part = json.load(open(partial_path))
    if rnd.get("sf") != part.get("sf"):
        sys.exit(f"refusing to merge different sf dirs: "
                 f"{rnd.get('sf')} vs {part.get('sf')}")
    extra = set(part["queries"]) - set(rnd["queries"])
    if extra:
        sys.exit(f"partial artifact times queries the round artifact "
                 f"lacks: {sorted(extra)} — merge would change the surface")
    qs = dict(rnd["queries"])
    rc, pc = clean_map(rnd), clean_map(part)
    for q, t in part["queries"].items():
        if t is None or t < 0:
            continue
        if qs.get(q) is None or qs[q] < 0 or t < qs[q]:
            qs[q] = t
        rc[q] = max(rc.get(q, 0), pc.get(q, 0))
    unclean = sorted(q for q in qs if rc.get(q, 0) < 2)
    out = dict(rnd)
    out["queries"] = qs
    out["clean_reps"] = rc
    out["value"] = round(sum(t for t in qs.values() if t >= 0), 6)
    out["unclean"] = unclean
    out["unclean_n"] = len(unclean)
    out["probe_ok"] = not unclean
    out["merged_from"] = (rnd.get("merged_from") or [round_path]) + [partial_path]
    with open(out_path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(f"merged {len(part['queries'])} partial queries into "
          f"{len(qs)}-query artifact: value={out['value']:.2f}s "
          f"unclean_n={out['unclean_n']}")


if __name__ == "__main__":
    main()
