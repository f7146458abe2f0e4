"""Compare two bench JSON lines and flag per-query regressions.

Usage: python tools/bench_compare.py BENCH_old.json BENCH_new.json [ratio]

Reads the driver's one-line bench artifacts (or bench.py stdout saved
to a file), joins per-query timings, and reports queries slower than
``ratio`` (default 1.5x) in the new run plus the headline delta.
Exit code 1 if any regression crosses the threshold AND the headline
total also regressed by the same ratio — single-query noise on a
shared host doesn't fail the gate by itself (see ROADMAP.md's
measured host-variance caveat).

Load gating: this container shares a host, and external contention has
produced phantom regressions (BENCH_r11 read 1.64x worse at
loadavg_start 8.18; an idle re-run reversed every per-query
"regression"). ``loadavg_start`` is sampled before the bench spawns
any work, so it is a clean external-load reading. When either run
started above LOAD_SOFT (4.0) the regression ratio is widened 1.5x
and the verdict says so; above LOAD_HARD (8.0) the gate refuses
entirely (report-only, exit 0) — a number measured under that much
contention cannot distinguish code from neighbors.
"""

from __future__ import annotations

import json
import re
import sys


def _unpack(line_obj: dict) -> dict | None:
    """Decode bench.py's gzip+base64 'packed' full-record line."""
    import base64
    import gzip

    try:
        return json.loads(gzip.decompress(base64.b64decode(line_obj["packed"])))
    except Exception:  # truncated/corrupt pack: fall through to regex
        return None


def _recover_tail(tail: str) -> dict:
    """Best-effort recovery of a FRONT-truncated bench stdout capture
    (the BENCH_r12 shape: the driver kept only the last 2000 chars, so
    the record's opening brace is gone and ``parsed`` is null). Flat
    sub-objects and scalar fields that survived whole are extracted by
    regex; whatever the truncation ate stays absent — the caller
    prints which keys were recovered so a '?' row reads as 'truncated
    away', not 'mysteriously missing'."""
    out: dict = {}
    for suite in ("queries", "tpch_queries", "llm_queries"):
        m = re.search(rf'"{suite}":\s*(\{{[^{{}}]*\}})', tail)
        if m:
            try:
                out[suite] = json.loads(m.group(1))
            except json.JSONDecodeError:
                pass
    for key in (
        "value", "streaming_events_per_sec", "sf",
        "tpch_suite_wall_seconds", "llm_suite_wall_seconds",
    ):
        m = re.search(rf'"{key}":\s*(-?[\d.]+)', tail)
        if m:
            v = float(m.group(1))
            out[key] = int(v) if v == int(v) and "." not in m.group(1) else v
    m = re.search(r'"action":\s*"([^"]+)"', tail)
    if m:
        out["action"] = m.group(1)
    for key in ("loadavg_start", "loadavg_legs"):
        m = re.search(rf'"{key}":\s*(\[[^\]]*\]|\{{[^{{}}]*\}})', tail)
        if m:
            try:
                out[key] = json.loads(m.group(1))
            except json.JSONDecodeError:
                pass
    # Last resort for per-query values whose enclosing dict was CUT AT
    # THE FRONT (the BENCH_r13 shape: the full record's llm_queries
    # open brace is truncated away, so the whole-dict regex above can
    # never match, yet every surviving `"q_x": 1.23` pair is intact).
    # Pairs are attributed to the SUITE whose dict they sit in — a
    # query name can legitimately appear in several suites with
    # DIFFERENT values (q_tpch_q7_like: 0.552 headline vs 0.521 tpch
    # in BENCH_r14), so a flat first-occurrence map could fill a row
    # with the wrong-suite value (r15 ADVICE). Region attribution:
    # pairs inside a visible `"<suite>": {` span belong to that suite;
    # pairs BEFORE the first unmatched `}` (the front-cut dict's close)
    # belong to the suite identified by the scalar key bench.py prints
    # right after that dict (fixed print order we control).
    sp = _tail_suite_pairs(tail)
    if sp:
        out["_tail_suite_pairs"] = sp
    return out


_ORPHAN_SUITE_BY_NEXT_KEY = (
    # scalar printed immediately after each suite dict in bench.py
    ('"tpch_suite_wall_seconds"', "queries"),
    ('"llm_suite_wall_seconds"', "tpch_queries"),
    ('"streaming_events_per_sec"', "llm_queries"),
)

# JSON numbers incl. exponent form (json.dumps emits 1e-05 for tiny
# floats); the lookahead rejects partial matches so a value the regex
# can't represent whole is SKIPPED, never silently mis-parsed (ADVICE)
_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_PAIR_RE = re.compile(rf'"(q_[a-zA-Z0-9_]+)":\s*({_NUM})(?=\s*[,}}])')


def _tail_suite_pairs(tail: str) -> dict[str, dict[str, float]]:
    """Suite-scoped `"q_x": 1.23` pair recovery from a truncated tail
    (see the comment at the call site). Returns {suite: {name: value}}
    with only non-empty suites; pairs whose suite cannot be determined
    are dropped (an honest 'missing' row beats a wrong-suite value)."""
    regions: list[tuple[int, int, str]] = []
    for m in re.finditer(r'"(queries|tpch_queries|llm_queries)":\s*\{', tail):
        end = tail.find("}", m.end())
        regions.append((m.end(), end if end != -1 else len(tail), m.group(1)))
    first_region = min((s for s, _, _ in regions), default=len(tail))
    orphan_end = tail.find("}")
    orphan_suite = None
    if orphan_end != -1 and orphan_end < first_region:
        after = tail[orphan_end : orphan_end + 80]
        for key, suite in _ORPHAN_SUITE_BY_NEXT_KEY:
            if key in after:
                orphan_suite = suite
                break
    out: dict[str, dict[str, float]] = {}
    for m in _PAIR_RE.finditer(tail):
        pos = m.start()
        suite = next(
            (name for s, e, name in regions if s <= pos < e), None
        )
        if suite is None and orphan_suite is not None and pos < orphan_end:
            suite = orphan_suite
        if suite is not None:
            # first occurrence wins within a suite (full record prints
            # before the compact summary; within one suite they agree)
            out.setdefault(suite, {}).setdefault(m.group(1), float(m.group(2)))
    return out


def _load(path: str) -> dict:
    text = open(path).read().strip()
    try:
        d = json.loads(text)  # whole file (driver artifact or bare line)
    except json.JSONDecodeError:
        # bench.py stdout capture: since r13 it prints the full record
        # THEN a compact summary line (tail-truncation guard). Merge
        # every JSON line in print order so the compact line's scalars
        # layer over the full line without losing its per-suite maps.
        d = {}
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "packed" in obj:
                    obj = _unpack(obj) or {}
                d.update(obj)
        if not d:
            raise SystemExit(f"{path}: no JSON object found") from None
    # the driver wraps bench.py's stdout under "parsed" + "tail". Two
    # degraded shapes exist: parsed=null (r12 — the tail capture was
    # front-truncated before any JSON line) and parsed=compact-summary
    # (r13+ — the tail-proof summary line parses, but the per-suite
    # maps live only in the truncated full record). In both, recover
    # whole sub-objects from the tail by regex and merge them UNDER the
    # parsed keys, so '?' rows mean 'truncated away', never silence.
    if "parsed" in d:
        parsed = d["parsed"] if isinstance(d["parsed"], dict) else {}
        if isinstance(parsed.get("packed"), str):  # driver parsed the packed line
            parsed = _unpack(parsed) or {}
        tail = d.get("tail") if isinstance(d.get("tail"), str) else ""
        rec = {}
        # an intact packed line in the tail beats regex recovery: it IS
        # the full record (r14+ artifacts carry one)
        m = re.search(r'\{"packed":\s*"[A-Za-z0-9+/=]+"\}', tail)
        if m:
            rec = _unpack(json.loads(m.group(0))) or {}
        if not rec and tail:
            rec = _recover_tail(tail)
        merged_from_tail = sorted(
            k for k in rec if k not in parsed and k != "_tail_suite_pairs"
        )
        if "_tail_suite_pairs" in rec:
            n_pairs = sum(len(v) for v in rec["_tail_suite_pairs"].values())
            merged_from_tail.append(
                f"{n_pairs} per-query values (suite-scoped pair fallback)"
            )
        if not parsed:
            print(
                f"NOTE: {path} has parsed:null (tail-truncated artifact) — "
                f"recovered keys from its tail: {merged_from_tail or 'none'}; "
                "anything else was truncated away and diffs as missing"
            )
        elif merged_from_tail:
            print(
                f"NOTE: {path}: parsed is the compact summary line; "
                f"recovered from its tail: {merged_from_tail}"
            )
        return {**rec, **parsed}
    return d


LOAD_SOFT = 4.0  # widen the gate: contention is inflating timings
LOAD_HARD = 8.0  # refuse the gate: the measurement is not code signal


def _start_load(d: dict) -> float | None:
    """1-min loadavg sampled before the bench spawned any work."""
    la = d.get("loadavg_start")
    if isinstance(la, (list, tuple)) and la:
        try:
            return float(la[0])
        except (TypeError, ValueError):
            return None
    return None


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    lo, ln = _start_load(old), _start_load(new)
    worst_load = max(x for x in (lo, ln, 0.0) if x is not None)
    load_note = ""
    gate_enabled = True
    if worst_load > LOAD_HARD:
        gate_enabled = False
        load_note = (
            f"LOAD GATE REFUSED: loadavg_start old={lo} new={ln} "
            f"(worst {worst_load} > {LOAD_HARD}) — report-only; re-run "
            "on an idle host before trusting any regression below"
        )
    elif worst_load > LOAD_SOFT:
        ratio *= 1.5
        load_note = (
            f"LOAD GATE WIDENED: loadavg_start old={lo} new={ln} "
            f"(worst {worst_load} > {LOAD_SOFT}) — regression threshold "
            f"widened to {ratio:.2f}x"
        )
    if load_note:
        print(load_note)
    legs_old, legs_new = old.get("loadavg_legs"), new.get("loadavg_legs")
    if legs_old or legs_new:
        print(f"per-leg load: old={legs_old} new={legs_new} "
              "(includes the bench's own load — diagnostic only)")
    # measurement-action provenance: runs before round 9 used count()
    # (absent field), which let Catalyst prune map-only projections
    # and unique-key left joins — those timings under-measure and are
    # NOT comparable with noop_write runs
    act_old = old.get("action", "count")
    act_new = new.get("action", "count")
    comparable = act_old == act_new
    if not comparable:
        print(
            f"WARNING: measurement actions differ ({act_old} vs {act_new}) — "
            "count()-era timings under-measure pruned plans; per-query "
            "ratios below are shown for reference but do NOT gate"
        )
    rows = []
    # every per-query dict the bench emits gets its own diff section:
    # headline battery, TPC-H suite, LLM-ops suite (round 5+)
    osp = old.get("_tail_suite_pairs") or {}
    nsp = new.get("_tail_suite_pairs") or {}
    for suite in ("queries", "tpch_queries", "llm_queries"):
        oq, nq = old.get(suite) or {}, new.get(suite) or {}
        ofb, nfb = osp.get(suite) or {}, nsp.get(suite) or {}
        if not (oq or nq or ofb or nfb):
            continue
        rows.append((f"-- {suite} --", None, None, None, ""))
        for name in sorted(set(oq) | set(nq)):
            a, b = oq.get(name), nq.get(name)
            # value-level fallback to SUITE-SCOPED tail-recovered pairs:
            # fills rows a front-truncated artifact would otherwise diff
            # as missing, and can never cross-fill from another suite's
            # same-named entry (r15 ADVICE)
            a = ofb.get(name) if a is None else a
            b = nfb.get(name) if b is None else b
            if a is None or b is None:
                rows.append((name, a, b, None, "missing in one run"))
                continue
            r = b / a if a else float("inf")
            flag = "REGRESSED" if r >= ratio else ("improved" if r <= 1 / ratio else "")
            rows.append((name, a, b, r, flag))
    # throughput metrics (higher = better): regression is new < old/1.15.
    # The threshold is FIXED at 1.15x — it models measured host noise
    # (streaming varies ~5% run-to-run; r5→r6 drifted −3.2% with no
    # code change), which doesn't scale with the user's wall-time
    # ratio: a tight ratio would flag documented noise, a loose one
    # would hide real drops.
    os_, ns = old.get("streaming_events_per_sec"), new.get("streaming_events_per_sec")
    if os_ is not None and ns is not None:
        rows.append(("-- throughput --", None, None, None, ""))
        r = os_ / ns if ns else float("inf")
        flag = "REGRESSED" if r >= 1.15 else ("improved" if r <= 1 / 1.15 else "")
        rows.append(("streaming_events_per_sec", os_, ns, r, flag))
    if not rows:
        print("nothing to compare: neither file has a known suite key")
        return 2
    w = max(len(r[0]) for r in rows)
    for name, a, b, r, flag in rows:
        if a is None and b is None and r is None and not flag:
            print(name)
            continue
        rs = f"{r:5.2f}x" if r is not None else "    ? "
        print(f"{name:<{w}}  {a!s:>7} -> {b!s:>7}  {rs}  {flag}")
    ov, nv = old.get("value"), new.get("value")
    print(f"\nheadline: {ov} -> {nv}")
    for total in ("tpch_suite_wall_seconds", "llm_suite_wall_seconds"):
        if old.get(total) is not None or new.get(total) is not None:
            print(f"{total}: {old.get(total)} -> {new.get(total)}")
    regressed = [r for r in rows if r[4] == "REGRESSED"]
    wall_regressed = [r for r in regressed if r[0] != "streaming_events_per_sec"]
    if wall_regressed:
        print(f"{len(wall_regressed)} queries >= {ratio}x slower")
    if len(wall_regressed) != len(regressed):
        print("streaming throughput regressed >= 1.15x (fixed noise gate)")
    # ov == 0 (errored/empty baseline artifact): treat like the
    # per-query path — any nonzero new value is an infinite ratio
    headline_bad = (
        ov is not None
        and nv is not None
        and (nv / ov if ov else float("inf") if nv else 1.0) >= ratio
    )
    if not gate_enabled and (regressed or headline_bad):
        print("verdict withheld: measured under loadavg "
              f"{worst_load} (> {LOAD_HARD}) — not gating")
    return 1 if (comparable and gate_enabled and regressed and headline_bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
