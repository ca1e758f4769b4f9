"""Plan guard: lint a DataFrame's physical plan for scale anti-patterns
before launching it on real data.

tests/test_plans.py pins the shipped queries; this is the same idea as a
runtime API for ad-hoc plans — a 100 TB job with a cartesian product or
an un-pushed scan filter should fail at submit time, not six hours in.

Checks are string properties of ``explain("formatted")`` output, the
stable user-facing plan surface.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

# Operators that are quadratic (or ship a whole side to every task) and
# are never what you want on corpus-sized inputs.
DEFAULT_FORBIDDEN = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
)

# Wrapper/leaf operators that may legitimately sit between a Filter and
# the file scan it filters. Anything else (a Project, Generate, Join,
# Aggregate, Exchange...) between them means the Filter is NOT the
# pushed-to-the-scan form the HOF lint targets.
_SCAN_ADJACENT_OPS = (
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
    "Scan",
    "BatchScan",
    "RowDataSourceScan",
)

# The rendered marker of a higher-order-function lambda in a plan
# Condition. HOF lambdas never whole-stage-codegen — they evaluate
# interpreted, per element, re-computing every free subexpression. A
# FLAT lambda at a scan filter (e.g. x30's token-count gate
# size(filter(split(text), len > 0)) >= 8) is a cheap linear scan and
# legitimate; the pathology is a lambda whose BODY re-does whole-input
# work per element — either a NESTED lambda (the body walks another
# array, O(n^2) and worse: the round-11 fused winnow sel(grams(text))
# form, ~1 min/doc) or a free string-derivation chain (the round-12
# staged-chars case: a pushed predicate inlined
# trim(regexp_replace(lower(text))) into the char-code lambda, the
# full regex re-run per element — the measured 29x). Both are the
# signature of Catalyst having inlined a staged expensive column below
# its staging Project; see operators/textstats.winnow_fingerprints and
# winnow_gram_col.
_HOF_MARKER = "lambdafunction("

# Whole-input derivation calls that have no business INSIDE a lambda
# body at a scan filter UNLESS they operate on the lambda variable:
# applied to a FREE input (an attribute chain), each re-runs over that
# whole input per element — the inlined-staging shape. Element-scoped
# uses (x24 regex-normalizes each extracted URL:
# regexp_replace(lambda x, ...)) are legitimate and recognized by the
# call's argument extent referencing ``lambda ``. transform/aggregate/
# filter nested inside a lambda render their own lambdafunction( and
# are caught by the nested rule; this list catches the lambda-free
# re-derivations.
_EXPENSIVE_IN_LAMBDA = (
    "regexp_replace(",
    "regexp_extract",
    "split(",
    "sequence(",
    "from_json(",
)


def _paren_extent(s: str, open_idx: int) -> str:
    """The balanced-paren span starting at ``s[open_idx] == '('``;
    fails open to end-of-string on unbalanced renders."""
    depth, i = 1, open_idx + 1
    while i < len(s) and depth > 0:
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    return s[open_idx:i]


def _free_expensive_call(body: str) -> str | None:
    """The first expensive-call marker in a lambda body whose argument
    extent does NOT reference the lambda variable — a whole-input
    re-derivation per element — or None."""
    for marker in _EXPENSIVE_IN_LAMBDA:
        start = body.find(marker)
        while start != -1:
            op = body.find("(", start + len(marker) - 1)
            if op == -1:
                break
            if "lambda " not in _paren_extent(body, op):
                return marker.rstrip("(")
            start = body.find(marker, op + 1)
    return None

# Opt-in size backstop for scan-level Filter conditions. OFF by
# default: rendered size alone does not mean per-row expense — x24's
# planted-URL synthesis inlines ~15 KB of O(1) concat/CASE over doc_id
# into its scan filters legitimately, while the genuinely quadratic
# fused-winnow form (3 KB) is caught structurally by the nested-HOF
# rule. Pass e.g. ``max_scan_filter_chars=2000`` for corpora where no
# legitimate scan predicate should render large.
DEFAULT_MAX_SCAN_FILTER_CHARS: int | None = None


def _expensive_lambda_body(cond: str) -> str | None:
    """The quadratic re-evaluation signature, or None: a rendered
    lambda BODY that contains either another lambda (per-element array
    walk) or a whole-input derivation call (per-element regex/split
    chain over a free input — the inlined-staging shape). Walks
    balanced parens from each ``lambdafunction(``; an unbalanced
    render (parens inside a string literal) fails open to
    end-of-string, which only widens the net."""
    start = cond.find(_HOF_MARKER)
    while start != -1:
        i = start + len(_HOF_MARKER)
        depth = 1
        while i < len(cond) and depth > 0:
            if cond[i] == "(":
                depth += 1
            elif cond[i] == ")":
                depth -= 1
            i += 1
        body = cond[start + len(_HOF_MARKER) : i]
        if _HOF_MARKER in body:
            return "a NESTED HOF lambda (per-element array walk)"
        hit = _free_expensive_call(body)
        if hit is not None:
            return (
                f"a lambda body re-deriving '{hit}' over a free input "
                "per element (inlined staged chain)"
            )
        start = cond.find(_HOF_MARKER, i)
    return None


class PlanGuardError(RuntimeError):
    """A scale anti-pattern was found in the physical plan."""


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _scan_filter_conditions(plan: str) -> list[tuple[int, str]]:
    """(node_id, condition) of every Filter that sits DIRECTLY on a file
    scan — only wrapper ops (ColumnarToRow et al.) between it and the
    leaf. These are the filters Catalyst produced by pushing a predicate
    below every staging Project, which is where an inlined staged-HOF
    expression lands (see the lint rationale at ``_HOF_MARKERS``)."""
    tree = plan.split("\n\n")[0]
    lines = [ln for ln in tree.splitlines() if re.search(r"\(\d+\)", ln)]
    adjacent_ids: list[int] = []
    for i, ln in enumerate(lines):
        m = re.search(r"\bFilter\b.*\((\d+)\)", ln)
        if not m:
            continue
        # walk the unary chain below the Filter: wrapper ops only, until
        # the scan leaf. Any other op => not a scan-level filter.
        for nxt in lines[i + 1 :]:
            op = re.sub(r"[*+\-:\s]+", " ", nxt.split("(")[0]).strip()
            if op.startswith("Scan") or op in ("BatchScan", "RowDataSourceScan"):
                adjacent_ids.append(int(m.group(1)))
                break
            if not any(op.startswith(w) for w in _SCAN_ADJACENT_OPS):
                break
    out: list[tuple[int, str]] = []
    for nid in adjacent_ids:
        dm = re.search(
            rf"^\({nid}\) Filter.*?^Condition : (.*?)$",
            plan,
            re.M | re.S,
        )
        if dm:
            out.append((nid, dm.group(1)))
    return out


def check_plan(
    df: DataFrame,
    forbid: tuple[str, ...] = DEFAULT_FORBIDDEN,
    max_shuffles: int | None = None,
    require_pushed_filters: bool = False,
    max_scan_filter_chars: int | None = DEFAULT_MAX_SCAN_FILTER_CHARS,
) -> list[str]:
    """Return a list of violations (empty = clean).

    - ``forbid``: operator names that must not appear (default: the
      quadratic joins).
    - ``max_shuffles``: cap on data shuffles (Exchange operators,
      broadcasts excluded) — a plan that shuffles the corpus five times
      usually has a missing pre-partitioning.
    - ``require_pushed_filters``: every file scan that sits under a
      Filter must carry a non-empty PushedFilters list (a selective
      query reading whole files is a silent 100x).
    - staged-HOF inlining lint (always on; VERDICT r11 #1): a Filter
      sitting directly on a file scan whose condition contains a
      NESTED HOF lambda (a lambda body walking another array — the
      quadratic re-evaluation shape) is the signature of Catalyst
      having pushed a predicate on a staged expensive column below its
      staging Project and inlined the whole expression (two measured
      ~1 min/doc pathologies in round 11 — InferFiltersFromGenerate on
      a plain explode, then ordinary filter pushdown). Both fixes are
      mechanical: explode_outer + filter on the GENERATED attribute,
      or filter on a downstream aggregate instead of the staged
      column. Flat scan-level lambdas (x30's token-count gate) and
      large-but-cheap inlined scalar synthesis (x24) stay clean. The
      same check runs over every scan's DataFilters list (where the
      pushed predicate is also recorded). ``max_scan_filter_chars``
      additionally flags any scan-level condition rendering larger
      than the given size (opt-in; see DEFAULT_MAX_SCAN_FILTER_CHARS).
    """
    plan = formatted_plan(df)
    violations: list[str] = []
    for op in forbid:
        if op in plan:
            violations.append(f"forbidden operator in plan: {op}")
    if max_shuffles is not None:
        # count operators in the numbered tree section only (formatted
        # output lists each op once in the tree, once in details)
        tree = plan.split("\n\n")[0]
        shuffles = len(re.findall(r"\bExchange\b", tree)) - len(
            re.findall(r"\bBroadcastExchange\b", tree)
        )
        if shuffles > max_shuffles:
            violations.append(
                f"{shuffles} data shuffles in plan (max {max_shuffles})"
            )
    if require_pushed_filters and "Filter" in plan:
        if "PushedFilters: []" in plan:
            violations.append(
                "scan under a Filter has an empty PushedFilters list"
            )
    for nid, cond in _scan_filter_conditions(plan):
        why = _expensive_lambda_body(cond)
        if why is not None:
            violations.append(
                f"scan-level Filter ({nid}) contains {why} — a staged "
                "expensive expression was pushdown-inlined below its "
                "staging Project (filter on a generated/aggregated "
                "value instead of the staged column; see "
                "textstats.winnow_fingerprints)"
            )
        elif (
            max_scan_filter_chars is not None
            and len(cond) > max_scan_filter_chars
        ):
            violations.append(
                f"scan-level Filter ({nid}) condition is "
                f"{len(cond)} chars (max {max_scan_filter_chars}) — "
                "likely an inlined staged expression"
            )
    # DataFilters render on ONE line and are truncated to
    # spark.sql.maxMetadataStringLength (default 100 chars), so this
    # arm is best-effort: a long fused expression may be cut before
    # its lambda appears (the untruncated Condition arm above is the
    # primary check; a never-terminated multi-line regex here used to
    # capture unrelated plan lines — round-12 review finding).
    for ln in plan.splitlines():
        stripped = ln.strip()
        if stripped.startswith("DataFilters:"):
            why = _expensive_lambda_body(stripped)
            if why is not None:
                violations.append(
                    f"scan DataFilters contain {why} — a staged "
                    "expensive expression was pushdown-inlined into "
                    "the scan"
                )
                break
    return violations


def assert_scalable(df: DataFrame, **kwargs) -> DataFrame:
    """Raise ``PlanGuardError`` listing every violation; returns the
    DataFrame unchanged so it chains into a pipeline."""
    violations = check_plan(df, **kwargs)
    if violations:
        raise PlanGuardError("; ".join(violations))
    return df
