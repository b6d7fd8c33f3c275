#!/usr/bin/env python3
"""Static screen for the q274 class of oracle-twin hazard: DuckDB 1.0.0
INLINES a CTE at every reference site, so a CTE referenced more than once
multiplies its subplan — and a chain of such CTEs (q274's 8 peels, each
referencing its predecessor twice) grows the plan EXPONENTIALLY. One such
twin hung the driver's whole-round compare and zeroed CORRECTNESS_r07.

Usage: cte_audit.py <oracle_sql.json>

Mirrors graft.queries.Oracles.materialize (the registration-time rewriter
that inserts AS MATERIALIZED): walks every WITH chain quote-aware, finds
CTE definitions (top-level and nested-in-subquery), counts word-boundary
references outside each CTE's own body (string literals excluded), and
flags any non-MATERIALIZED CTE referenced >= 2 times. Self-references
only mean recursion under WITH RECURSIVE (exempt — executed iteratively);
elsewhere they are shadowing aliases and do not exempt.

Exit 1 if any flag fires — the session-close gate requires a clean audit.
"""
import json
import re
import sys


WITH_KW = re.compile(r'\bWITH\s+(RECURSIVE\s+)?', re.IGNORECASE)
CTE_HEAD = re.compile(r'([A-Za-z_][A-Za-z_0-9]*)\s*(\([^()]*\))?\s+AS\s+'
                      r'(MATERIALIZED\s+)?\(', re.IGNORECASE)


def string_mask(sql):
    """Per-char inside-single-quoted-string flags ('' escape aware)."""
    mask = [False] * len(sql)
    in_str = False
    i = 0
    while i < len(sql):
        mask[i] = in_str
        if in_str:
            if sql[i] == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    mask[i + 1] = True
                    i += 1
                else:
                    in_str = False
        elif sql[i] == "'":
            in_str = True
            mask[i] = True
        i += 1
    return mask


def find_ctes(sql, mask):
    """[(name, def_start, body_start, body_end, materialized, recursive)]"""
    ctes = []
    for wm in WITH_KW.finditer(sql):
        if mask[wm.start()]:
            continue
        recursive = bool(wm.group(1))
        pos = wm.end()
        while True:
            hm = CTE_HEAD.match(sql, pos)
            if not hm:
                break
            body_start = hm.end()
            depth, i = 1, body_start
            while i < len(sql) and depth:
                if not mask[i]:
                    if sql[i] == '(':
                        depth += 1
                    elif sql[i] == ')':
                        depth -= 1
                i += 1
            ctes.append((hm.group(1), hm.start(), body_start, i - 1,
                         bool(hm.group(3)), recursive))
            j = i
            while j < len(sql) and sql[j].isspace():
                j += 1
            if j < len(sql) and sql[j] == ',':
                pos = j + 1
                while pos < len(sql) and sql[pos].isspace():
                    pos += 1
            else:
                break
    return ctes


def audit_sql(sql):
    """Return [(cte, refs)] flags for multiply-referenced inlined CTEs."""
    mask = string_mask(sql)
    flags = []
    for name, dstart, bstart, bend, mat, rec in find_ctes(sql, mask):
        if mat:
            continue
        refs, self_ref = 0, False
        for r in re.finditer(r'\b%s\b' % re.escape(name), sql,
                             re.IGNORECASE):
            if mask[r.start()]:
                continue
            if bstart <= r.start() < bend:
                self_ref = True
            elif r.start() < dstart or r.start() >= bend:
                refs += 1
        if self_ref and rec:
            continue  # recursive member — executed iteratively
        if refs >= 2:
            flags.append((name, refs))
    return flags


def selftest():
    q274ish = ("WITH a AS (SELECT 1 x), s2 AS (SELECT x FROM a WHERE x IN "
               "(SELECT x FROM a)) SELECT * FROM s2")
    assert audit_sql(q274ish) == [("a", 2)], audit_sql(q274ish)
    ok = ("WITH a AS MATERIALIZED (SELECT 1 x), b AS (SELECT x FROM a) "
          "SELECT * FROM b JOIN a USING (x)")
    assert audit_sql(ok) == [], audit_sql(ok)
    rec = ("WITH RECURSIVE w AS (SELECT 1 x UNION ALL SELECT x+1 FROM w "
           "WHERE x < 3) SELECT * FROM w, w b")
    assert audit_sql(rec) == [], audit_sql(rec)
    single = "WITH a AS (SELECT 1 x) SELECT * FROM a"
    assert audit_sql(single) == [], audit_sql(single)
    # string literal containing the CTE name is not a reference
    lit = ("WITH m AS (SELECT strftime(d, '%Y-%m') x FROM t) "
           "SELECT * FROM m")
    assert audit_sql(lit) == [], audit_sql(lit)
    # WINDOW clause is not a CTE definition
    win = ("WITH a AS (SELECT 1 x) SELECT sum(x) OVER wf, min(x) OVER wf "
           "FROM a WINDOW wf AS (ORDER BY x)")
    assert audit_sql(win) == [], audit_sql(win)
    # shadowing alias in a NON-recursive body does not exempt
    shadow = ("WITH wf AS (SELECT x FROM t wf) "
              "SELECT * FROM wf JOIN wf b USING (x)")
    assert audit_sql(shadow) == [("wf", 2)], audit_sql(shadow)
    # nested WITH inside a subquery is audited too
    nested = ("SELECT * FROM (WITH v AS (SELECT 1 x) "
              "SELECT * FROM v JOIN v b USING (x)) t")
    assert audit_sql(nested) == [("v", 2)], audit_sql(nested)
    print("SELFTEST PASS (8 cases)")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return 0
    oracle = json.load(open(sys.argv[1]))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        flags = audit_sql(sql)
        if flags:
            n_bad += 1
            detail = ", ".join(f"{c}×{r}" for c, r in flags)
            print(f"FLAG {name}: inlined CTE(s) referenced >=2×: {detail}")
    print(f"== {len(oracle)} twins audited, {n_bad} flagged ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
