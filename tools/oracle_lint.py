"""Lint the DuckDB oracle corpus for cross-build determinism hazards.

Round 5's one driver-side failure (dedup_cdc_chunks) was an oracle whose
value depended on constructs that are legal everywhere but ENGINE-BUILD
sensitive: a hex-string->BIGINT cast inside a list lambda and a rounded
DOUBLE ratio in the hashed output. With 510 oracles the construct surface
is big; this tool sweeps all of them mechanically so the next such flake is
caught before a grading round, not by it.

Rules
-----
R1  hex-casts: every ``('0x' || ...)::T`` must be the canonical bounded
    idiom — a substr of a hex string of length <= 8 cast to BIGINT (max
    2^32-1, can never overflow; the idiom is proven green in the grading
    environment by the round-5 driver sample). Anything else is a finding.
R2  locale-dependent regex: POSIX classes (``[[:alpha:]]``), Unicode
    property classes (``\\p{L}``), or case-insensitive regexp flags are
    findings — their behavior follows the build's regex library and locale.
    ASCII character classes and explicit ranges are fine.
R4  correlated list_filter lambdas: a list_filter whose lambda captures a
    column of the enclosing row (``i -> f(text, i) ...``) is the construct
    class behind the round-5/6 driver-environment divergence; rewrite as
    UNNEST(range)+WHERE.
R3  near-boundary rounding (RUNTIME): for each ``round(X, d)`` in the final
    SELECT of an oracle, re-run the oracle with that instance rewritten to
    ``round(X, d+7)`` and measure every output value's distance to the
    nearest half-boundary of the 10^-d grid. A value within 1e-6 of a
    boundary means a 1-ulp libm difference between builds could flip the
    rounded digit and fail the exact-hash gate. Distances are measured on
    the actual sf data, so this is a *near-boundary check*, not a style rule.

Waivers: WAIVED maps query name -> reason; waived findings are reported but
don't fail. tests/test_oracle_lint.py wires R1+R2 (static, fast) into
pytest; R3 runs from the CLI (needs a populated sf_dir):

    python tools/oracle_lint.py /root/testdata/sf0.01        # all rules
    python tools/oracle_lint.py --static                     # R1+R2 only
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# Residual findings that are understood and accepted, with the reason.
WAIVED: dict[str, str] = {
    "decimal_interval_pack": (
        "round input is DECIMAL(18,2): exact integer tie-breaking in both "
        "engines, no float in the dataflow — the pack deliberately pins "
        "decimal half-away rounding cross-engine"
    ),
    "events_value_cusum_drift": (
        "pre-round value is exact-decimal prefix sums plus ONE IEEE "
        "multiply/subtract/divide — basic ops are correctly rounded and "
        "bit-identical across builds (no libm), so both engines round the "
        "same bits"
    ),
}

def _blank_line_comments(sql: str) -> str:
    """Replace ``--`` line comments with spaces, position-preserving.

    Quote-aware: a ``--`` inside a single-quoted string literal is content,
    and an apostrophe inside a comment (``-- kernel's offsets``) must NOT
    open a string — the round-7 ADVICE found exactly that desync breaking
    the R3 anchor and the R4 paren scan. Blanking (not deleting) keeps
    every offset valid into the original SQL, so span rewrites still line
    up, and the blanked text stays executable."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
            i += 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
        else:
            i += 1
    return "".join(out)


# -------------------------------------------------------------------- R1

# ('0x' || substr(<anything>, <pos>, <len>))::BIGINT with len <= 8
_CANON_HEX = re.compile(
    r"\('0x'\s*\|\|\s*substr\((?:[^()]|\([^()]*(?:\([^()]*\)[^()]*)*\))*,\s*(\d+)\)\s*\)::BIGINT"
)
_ANY_HEX = re.compile(r"\('0x'[^\n]*?::\w+")


def lint_hex_casts(oracles: dict[str, str]) -> dict[str, list[str]]:
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        for m in _ANY_HEX.finditer(sql):
            frag = m.group(0)
            cm = _CANON_HEX.search(frag)
            if cm is None or int(cm.group(1)) > 8:
                bad.setdefault(name, []).append(frag[:100])
    return bad


# -------------------------------------------------------------------- R2

_LOCALE_REGEX = re.compile(r"\[\[:\w+:\]\]|\\\\p\{|\\p\{|regexp_\w+\([^;]*?'i'\s*\)")


def lint_locale_regex(oracles: dict[str, str]) -> dict[str, list[str]]:
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        for m in _LOCALE_REGEX.finditer(sql):
            bad.setdefault(name, []).append(m.group(0)[:60])
    return bad


# -------------------------------------------------------------------- R4

# list_filter ONLY: correlated PREDICATE lambdas are the class the two red
# driver rounds isolated (dedup_cdc_chunks, and phrase_search_positional as
# the near-miss); correlated list_transform ARITHMETIC lambdas (the
# embedding dot-product idiom) are driver-proven green across rounds 5-6
# (ann_*/similarity_*/knn_* all hash-match in every driver sample).
_LIST_LAMBDA = re.compile(r"\blist_filter\s*\(", re.IGNORECASE)
# words in a lambda body that are never outer-column references
_R4_ALLOW = {
    "in", "and", "or", "not", "case", "when", "then", "else", "end", "is",
    "null", "true", "false", "between", "like", "as", "cast", "integer",
    "bigint", "double", "varchar", "hugeint", "smallint", "boolean", "date",
    "interval", "distinct",
}


def _paren_span(sql: str, open_pos: int) -> int:
    """Index just past the ')' matching the '(' at ``open_pos``."""
    depth, i = 1, open_pos + 1
    while depth and i < len(sql):
        if sql[i] == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    return i


def lint_correlated_lambdas(oracles: dict[str, str]) -> dict[str, list[str]]:
    """R4: list_filter PREDICATE lambdas whose body references a column of
    the enclosing row (any bare identifier that is not a lambda parameter,
    a function call, or a keyword). This is the construct class unique to
    the query that stayed red in the driver environment across rounds 5-6
    while green locally — a known cross-version DuckDB behavior-change
    area. Rewrite as UNNEST(range)+WHERE (the winnowing idiom,
    driver-proven green). Correlated list_transform arithmetic lambdas are
    deliberately exempt: dozens hash-match in every driver sample."""
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        sql = _blank_line_comments(sql)
        for m in _LIST_LAMBDA.finditer(sql):
            end = _paren_span(sql, m.end() - 1)
            args = sql[m.end() : end - 1]
            arrow = args.find("->")
            if arrow < 0:
                continue
            # lambda params: identifiers between the last top-level comma
            # before '->' and the arrow (either `x ->` or `(x, y) ->`)
            head = args[:arrow]
            cut = -1
            depth = 0
            for k, ch in enumerate(head):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    cut = k
            params = set(re.findall(r"[A-Za-z_]\w*", head[cut + 1 :]))
            body = args[arrow + 2 :]
            body_nostr = re.sub(r"'[^']*'", "''", body)
            correlated = sorted(
                w
                for w in set(re.findall(r"[A-Za-z_]\w*", body_nostr))
                if w.lower() not in _R4_ALLOW
                and w not in params
                and not re.search(rf"\b{re.escape(w)}\s*\(", body_nostr)
            )
            if correlated:
                bad.setdefault(name, []).append(
                    f"lambda captures outer column(s) {correlated}: "
                    + body.strip()[:80]
                )
    return bad


# -------------------------------------------------------------------- R3


def _final_select_pos(sql: str) -> int:
    """Offset of the first PAREN-DEPTH-0 SELECT — the output projection.

    For a WITH query every CTE body sits inside parens, so depth 0 is
    reached exactly at the final statement; UNION ALL branches (also depth
    0) are part of the output too. The previous anchor (last 'SELECT'
    substring) landed inside scalar subqueries in the projection and
    silently skipped earlier round() sites (ADVICE r6). Single-quoted
    strings are skipped so literal parens can't skew the depth."""
    depth, i, n = 0, 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and sql[i : i + 6].upper() == "SELECT":
            return i
        i += 1
    return 0


def _round_spans(sql: str, start: int) -> list[tuple[int, int, str, int]]:
    """(span_start, span_end, inner_expr, digits) for each OUTERMOST
    round( call at or after ``start``, by paren matching."""
    spans = []
    i = start
    while True:
        m = re.compile(r"\bround\s*\(", re.IGNORECASE).search(sql, i)
        if not m:
            break
        depth, j = 1, m.end()
        while depth and j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[m.end() : j - 1]
        # split the LAST top-level comma -> (expr, digits)
        depth2, cut = 0, -1
        for k, ch in enumerate(inner):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                cut = k
        if cut >= 0:
            dtxt = inner[cut + 1 :].strip()
            if re.fullmatch(r"\d+", dtxt):
                spans.append((m.start(), j, inner[:cut], int(dtxt)))
        i = j
    return spans


_AGG_NAMES = {"sum", "avg", "min", "max", "count", "any_value", "list"}


def _inside_aggregate(sql: str, start: int, pos: int) -> bool:
    """True when ``pos`` sits inside an aggregate call opened after
    ``start`` — per-term round-then-aggregate is the repo's sanctioned
    determinism recipe (the aggregate of 10^-d multiples is exact); only
    rounds applied to the OUTPUT value are R3's concern."""
    stack: list[str] = []
    ident = re.compile(r"[A-Za-z_][A-Za-z_0-9]*\s*$")
    i = start
    while i < pos:
        ch = sql[i]
        if ch == "(":
            m = ident.search(sql[start:i])
            stack.append(m.group(0).strip().lower() if m else "")
        elif ch == ")" and stack:
            stack.pop()
        i += 1
    return any(s in _AGG_NAMES for s in stack)


def lint_near_boundary(oracles: dict[str, str], sf_dir: str) -> dict[str, list[str]]:
    """R3: rewrite each final-select round(X, d) to round(X, d+7), re-run,
    and flag values within 1e-6 of a d-digit rounding boundary."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    findings: dict[str, list[str]] = {}
    for name, sql in sorted(oracles.items()):
        sql = _blank_line_comments(sql)
        fsel = _final_select_pos(sql)
        spans = [
            s
            for s in _round_spans(sql, fsel)
            if not _inside_aggregate(sql, fsel, s[0])
        ]
        if not spans:
            continue
        try:
            base = con.execute(sql).fetchall()
        except Exception as e:  # oracle itself broken -> other gates catch it
            findings.setdefault(name, []).append(f"oracle error: {e}")
            continue
        for s, e_, expr, d in spans:
            probe_sql = f"{sql[:s]}round({expr}, {d + 7}){sql[e_:]}"
            try:
                probe = con.execute(probe_sql).fetchall()
            except Exception as e:
                findings.setdefault(name, []).append(
                    f"probe rewrite failed for round(..., {d}): {e}"
                )
                continue
            if len(probe) != len(base) or not base:
                continue
            # columns whose values differ from the original are the probed
            # ones; measure their distance to the d-digit half-boundary
            ncols = len(base[0])
            for c in range(ncols):
                bvals = [r[c] for r in base]
                pvals = [r[c] for r in probe]
                if bvals == pvals:
                    continue
                for v in pvals:
                    if not isinstance(v, float):
                        continue
                    scaled = abs(v) * (10**d)
                    dist = abs((scaled % 1.0) - 0.5)
                    if dist < 1e-6:
                        findings.setdefault(name, []).append(
                            f"round(..., {d}) input {v!r} is {dist:.2e} from a "
                            f"half-boundary of the 1e-{d} grid"
                        )
                        break
    return findings


# -------------------------------------------------------------------- R5

# DuckDB types with no Spark equivalent: a driver harness that renders the
# oracle result through pandas/Arrow shows these differently from Spark's
# BIGINT/DOUBLE (duckdb 1.0.0 fetchdf() renders a HUGEINT sum 117740 as
# float64 117740.0), so rows+schema match but the value hash diverges —
# the demonstrated mechanism behind three driver-red rounds of
# dedup_cdc_chunks (an uncast SUM(BIGINT) -> HUGEINT). Ban them in output.
_R5_BANNED = {
    "HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
}


def lint_output_types(oracles: dict[str, str], sf_dir: str) -> dict[str, list[str]]:
    """R5: DESCRIBE every oracle against the parquet views and flag any
    output column whose DuckDB type has no exact Spark mapping
    (HUGEINT/unsigned family). DESCRIBE only binds/plans — no data is
    scanned — so this is cheap at any SF. Fix is always the same one-liner:
    CAST(SUM(...) AS BIGINT) in the final projection."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    findings: dict[str, list[str]] = {}
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            findings.setdefault(name, []).append(f"DESCRIBE failed: {e}")
            continue
        for col, typ, *_ in desc:
            base = typ.split("(")[0].strip().upper()
            if base in _R5_BANNED:
                findings.setdefault(name, []).append(
                    f"output column {col!r} has non-Spark-mappable type {typ}"
                )
    return findings


def run(sf_dir: str | None) -> int:
    from quackio_jl_spark.registry import ORACLES

    import duckdb

    print(f"oracle_lint: {len(ORACLES)} oracles, duckdb {duckdb.__version__}")
    hard = 0
    for rule, found in (
        ("R1 hex-cast", lint_hex_casts(ORACLES)),
        ("R2 locale-regex", lint_locale_regex(ORACLES)),
        ("R4 correlated-lambda", lint_correlated_lambdas(ORACLES)),
        ("R5 output-type", lint_output_types(ORACLES, sf_dir) if sf_dir else {}),
        ("R3 near-boundary", lint_near_boundary(ORACLES, sf_dir) if sf_dir else {}),
    ):
        for name, frags in sorted(found.items()):
            tag = "WAIVED" if name in WAIVED else "FINDING"
            if tag == "FINDING":
                hard += 1
            print(f"{tag} [{rule}] {name}: {frags[0]}"
                  + (f" (+{len(frags)-1} more)" if len(frags) > 1 else "")
                  + (f" -- {WAIVED[name]}" if name in WAIVED else ""))
    print(f"{hard} unwaived findings")
    return 1 if hard else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--static"]
    static = "--static" in sys.argv[1:]
    sys.exit(run(None if static else (args[0] if args else "/root/testdata/sf0.01")))
