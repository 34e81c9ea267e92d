"""Diff two QUERIES_MANIFEST.json files — the one-line regression check
the manifest's ``result_md5`` column exists for (VERDICT r5 #7): any
result change in ANY contract query between two sweeps shows up here
without re-running Spark.

    python tools/diff_manifest.py OLD.json NEW.json

Exit 0 when the contracts are result-identical (added queries are
reported but not failures — the contract is allowed to grow); exit 1 on
any removed query, status downgrade, row-count change, or result-hash
change. Typical use: ``git show <rev>:QUERIES_MANIFEST.json >
/tmp/old.json`` then diff against the working-tree manifest.
"""

from __future__ import annotations

import json
import sys


def diff(old: dict, new: dict) -> tuple[list[str], list[str]]:
    """Return (breaking, informational) finding lines."""
    breaking: list[str] = []
    info: list[str] = []
    oq, nq = old["queries"], new["queries"]
    for name in sorted(oq):
        if name not in nq:
            breaking.append(f"REMOVED   {name}")
            continue
        o, n = oq[name], nq[name]
        if o.get("status") == "verified" and n.get("status") != "verified":
            breaking.append(
                f"DOWNGRADE {name}: {o.get('status')} -> {n.get('status')}"
            )
            continue
        if o.get("status") != "verified":
            # old entry had no trustworthy result to compare against
            if n.get("status") == "verified":
                info.append(f"UPGRADE   {name}: now verified")
            continue
        if o.get("n_rows") is None and o.get("result_md5") is None:
            # manifest predates the n_rows/result_md5 schema — nothing
            # comparable recorded; flagging every query as a ROWCOUNT
            # regression would bury any real change
            info.append(f"NOHASH    {name}: old manifest has no result fields")
            continue
        if o.get("n_rows") != n.get("n_rows"):
            breaking.append(
                f"ROWCOUNT  {name}: {o.get('n_rows')} -> {n.get('n_rows')}"
            )
        elif o.get("result_md5") != n.get("result_md5"):
            breaking.append(
                f"RESULT    {name}: {o.get('result_md5')} -> "
                f"{n.get('result_md5')}"
            )
    for name in sorted(set(nq) - set(oq)):
        info.append(
            f"ADDED     {name}: {nq[name].get('status')} "
            f"({nq[name].get('n_rows')} rows)"
        )
    return breaking, info


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    breaking, info = diff(old, new)
    for line in info:
        print(line)
    for line in breaking:
        print(line)
    same = len(set(old["queries"]) & set(new["queries"]))
    print(
        f"compared {same} common queries "
        f"({old.get('generated_utc')} -> {new.get('generated_utc')}): "
        f"{len(breaking)} breaking, {len(info)} informational"
    )
    raise SystemExit(1 if breaking else 0)


if __name__ == "__main__":
    main()
