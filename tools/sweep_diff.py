"""Diff two driver-mimic sweep JSONs: status flips and shuffle drift.

The sweep records per-query shuffle-exchange counts (post-AQE final
plans); this tool turns two sweeps into an actionable diff:

- status changes (pass -> anything is a regression);
- exchange-count increases (a lost broadcast / new shuffle);
- queries added/removed.

Usage: python tools/sweep_diff.py OLD.json NEW.json
Exit 1 if any regression (status downgrade or exchange increase).

Caveats: compare like with like — sweeps taken before the post-execution
plan-capture fix (r6 fourth wave) counted the AQE INITIAL plan and are
not comparable to later sweeps; and a +/-1 exchange jitter can be AQE
runtime replanning rather than a code change — confirm a flagged query
with an isolated re-run before treating it as a regression.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    txt = open(path).read()
    # the mimic prints a trailing summary after the JSON object; decode
    # the first JSON value structurally instead of trimming at the last
    # '}' (which mis-parses if the summary ever contains a brace)
    obj, _ = json.JSONDecoder().raw_decode(txt, txt.index("{"))
    return obj


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    ok_status = ("pass", "rows_only")
    regressions: list[str] = []
    notes: list[str] = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None:
            if n["status"] in ok_status:
                notes.append(f"+ {name} (new: {n['status']})")
            else:
                regressions.append(f"! {name}: new query arrives {n['status']}")
            continue
        if n is None:
            notes.append(f"- {name} (removed; was {o['status']})")
            continue
        if o["status"] in ok_status and n["status"] not in ok_status:
            regressions.append(
                f"! {name}: {o['status']} -> {n['status']}"
                + (f" ({n.get('detail', '')})" if n.get("detail") else "")
            )
        elif o["status"] == "pass" and n["status"] == "rows_only":
            # losing the oracle hash-check IS a verification regression
            regressions.append(f"! {name}: pass -> rows_only (oracle pairing lost)")
        elif o["status"] != n["status"]:
            notes.append(f"~ {name}: {o['status']} -> {n['status']}")
        eo, en = o.get("exchanges"), n.get("exchanges")
        if eo is not None and en is not None:
            if en > eo:
                regressions.append(f"! {name}: exchanges {eo} -> {en}")
            elif en < eo:
                notes.append(f"~ {name}: exchanges {eo} -> {en} (improved)")
    for line in notes:
        print(line)
    for line in regressions:
        print(line)
    print(
        f"\n{len(set(old) | set(new))} queries compared: "
        f"{len(regressions)} regressions, {len(notes)} notes"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
