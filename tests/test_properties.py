"""Property-based invariants (hypothesis) over the pure-Python cores and the
Spark operators' algebraic laws. Each property is the invariant a 100 TB run
relies on but example tests can only spot-check: mass conservation, subset
monotonicity, partition totality. Spark-backed properties keep max_examples
small (each example is a Spark job); pure-Python ones run the default 100.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from log_parser_mind_spark.operators import sample as sm
from log_parser_mind_spark.operators.sessionize import conversation_sessions

MINSTD_M = (1 << 31) - 1


# ---------------------------------------------------------------------------
# Pure-Python mirror of sample._minstd — pinned here so the property suite
# detects any drift between the Spark expression and the documented rule.
# ---------------------------------------------------------------------------

def minstd_py(key: int, salt: int) -> int:
    h = key % MINSTD_M
    h = (h * 48271 + salt) % MINSTD_M
    h = (h * 48271) % MINSTD_M
    return (h * 48271) % MINSTD_M


@given(st.integers(min_value=0, max_value=2**62), st.integers(min_value=0, max_value=10**6))
def test_minstd_range_and_determinism(key, salt):
    h = minstd_py(key, salt)
    assert 0 <= h < MINSTD_M
    assert h == minstd_py(key, salt)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True),
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_sample_subset_monotonicity_pure(keys, f1, f2):
    """sample(min(f1,f2)) ⊆ sample(max(f1,f2)) — the law that makes
    fraction tuning safe: raising a stratum's fraction only ADDS docs, so a
    re-run never invalidates previously selected data."""
    lo, hi = sorted((f1, f2))
    kept_lo = {k for k in keys if minstd_py(k, 0) < int(lo * MINSTD_M)}
    kept_hi = {k for k in keys if minstd_py(k, 0) < int(hi * MINSTD_M)}
    assert kept_lo <= kept_hi


def sessions_py(seconds, gap_sec):
    """Reference sessionizer over a sorted list of epoch seconds."""
    out = []
    for s in sorted(seconds):
        if out and s - out[-1][-1] <= gap_sec:
            out[-1].append(s)
        else:
            out.append([s])
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),            # conv
            st.integers(min_value=0, max_value=7 * 24 * 60),  # minute offset
        ),
        min_size=1, max_size=40, unique=True,
    ),
    st.integers(min_value=1, max_value=120),                  # gap minutes
)
def test_sessionization_matches_reference(spark, turns, gap_minutes):
    """For ANY event set and gap: sessions partition the events (Σ n_turns
    == |events|), bounds come from the data, durations are consistent, and
    the whole result equals a single-threaded reference implementation."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (f"c{c}", i, "user", "x", "none", t0 + dt.timedelta(minutes=m))
        for i, (c, m) in enumerate(turns)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = conversation_sessions(df, gap_minutes=gap_minutes).collect()
    assert sum(r.n_turns for r in got) == len(rows)  # partition totality
    by_conv: dict[str, list] = {}
    for r in got:
        assert r.duration_sec == (r.end_ts - r.start_ts).total_seconds()
        by_conv.setdefault(r.conv_id, []).append(r)
    for conv, sess in by_conv.items():
        secs = [
            (t0 + dt.timedelta(minutes=m) - dt.datetime(1970, 1, 1)).total_seconds()
            for (c, m) in turns
            if f"c{c}" == conv
        ]
        want = sessions_py(secs, gap_minutes * 60)
        gotc = sorted(sess, key=lambda r: r.session_idx)
        assert [r.n_turns for r in gotc] == [len(w) for w in want]
        assert [r.session_idx for r in gotc] == list(range(len(want)))
        for r, w in zip(gotc, want):
            assert (r.start_ts - dt.datetime(1970, 1, 1)).total_seconds() == w[0]
            assert (r.end_ts - dt.datetime(1970, 1, 1)).total_seconds() == w[-1]


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=30),
    st.integers(min_value=16, max_value=512),
)
def test_packing_laws(spark, token_counts, budget):
    """Packing partitions the corpus (every doc exactly once), respects the
    grid bound (pack sum − its max doc < budget), and is invariant to input
    partitioning."""
    docs = spark.createDataFrame(
        [(i, " ".join("w" for _ in range(n)) if n else "") for i, n in enumerate(token_counts)],
        "doc_id long, text string",
    )
    packs = sm.pack_corpus(docs, budget_tokens=budget, n_shards=4)
    rows = packs.collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(token_counts)))
    agg = {}
    for r in rows:
        key = (r.shard, r.pack_id)
        s, m = agg.get(key, (0, 0))
        agg[key] = (s + r.n_tokens, max(m, r.n_tokens))
    for (s, m) in agg.values():
        assert s - m < budget  # grid bound
    again = sm.pack_corpus(docs.repartition(7), budget_tokens=budget, n_shards=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_minstd_mirror_matches_spark_expression(spark):
    """The pure-Python mirror above exists to detect drift in the Spark
    expression — so actually compare them (review r4: without this, every
    property here tested the mirror against itself)."""
    keys = [0, 1, 44_505, 44_506, 123_456_789, 2**31, 2**40 + 17,
            1_200_000_000_000_000_000]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r.doc_id: r.h
        for r in df.select("doc_id", sm._minstd("doc_id", 7).alias("h")).collect()
    }
    assert got == {k: minstd_py(k, 7) for k in keys}


# ---------------------------------------------------------------------------
# r4 second wave: repetition metrics + global paragraph dedup vs pure-Python
# references over adversarial whitespace-heavy texts (one Spark job per
# example — the whole generated corpus goes through in a single DataFrame).
# ---------------------------------------------------------------------------

def _rep_py(text):
    """Reference for curate.repetition_scores (documented semantics)."""
    import re

    t = text or ""
    lines = [l for l in t.split("\n") if l.strip(" ") != ""]
    n_lines = len(lines)
    from collections import Counter

    lc = Counter(lines)
    dup_cnt = sum(c for c in lc.values() if c > 1)
    dup_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
    tot_chars = sum(c * len(l) for l, c in lc.items())
    toks = [x for x in re.split(r"\s+", t.lower()) if x != ""]

    def top(n):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            return 0
        gc = Counter(grams)
        best = max(gc.items(), key=lambda kv: (kv[1], len(kv[0])))
        return best[1] * len(best[0])

    r = lambda num, den: round(num / den, 6) if den > 0 else 0.0  # noqa: E731
    return (
        n_lines,
        r(dup_cnt, n_lines),
        r(dup_chars, tot_chars),
        r(top(2), len(t)),
        r(top(3), len(t)),
    )


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet=" abc\n", max_size=40), min_size=1, max_size=12))
def test_repetition_scores_matches_python_reference(spark, texts):
    from log_parser_mind_spark.operators.curate import repetition_scores

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_lines, r.dup_line_frac, r.dup_line_char_frac,
            r.top_2gram_char_frac, r.top_3gram_char_frac,
        )
        for r in repetition_scores(docs).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(_rep_py(t)), (i, t)


def _paragraph_dedup_py(texts):
    """Reference for curate.dedup_paragraphs: global first-occurrence keep in
    (doc, pos) order, blank-normalized paragraphs exempt."""
    import re

    norm = lambda p: re.sub(r"\s+", " ", p.strip(" ")).lower()  # noqa: E731
    seen = set()
    out = {}
    for i, t in enumerate(texts):
        kept = []
        for p in (t or "").split("\n\n"):
            n = norm(p)
            if n == "":
                kept.append(p)
            elif n not in seen:
                seen.add(n)
                kept.append(p)
        out[i] = "\n\n".join(kept)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet=" ab\n", max_size=50), min_size=1, max_size=12))
def test_dedup_paragraphs_matches_python_reference(spark, texts):
    from log_parser_mind_spark.operators.curate import dedup_paragraphs

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.text for r in dedup_paragraphs(docs).collect()}
    assert got == _paragraph_dedup_py(texts)


def _cc_py(pairs):
    """Union-find reference for dedup.connected_components."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, raw_pairs):
    """Min-label propagation == union-find min-root on arbitrary random
    graphs (chains, cliques, cycles, self-symmetric duplicates)."""
    from log_parser_mind_spark.operators import dedup

    pairs = [(min(a, b), max(a, b)) for a, b in raw_pairs]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    comps = dedup.connected_components(df, max_iter=50)
    got = {r.doc_id: r.component_id for r in comps.collect()}
    assert got == _cc_py(pairs)


# ---------------------------------------------------------------------------
# r5: span ops under RANDOM separators (incl. regex metacharacters and
# multi-char seps — the _regex_literal quoting path) and pathological
# corpora, vs sep-parameterized pure-Python references.
# ---------------------------------------------------------------------------

_SEPS = ["\n", "|", ". ", "**", "\\E", "\\Q", "[", ".", "+", " ", "ab", "||", "\n\n"]


def _norm_line(line):
    import re

    return re.sub(r"\s+", " ", line.strip(" ")).lower()


def _strip_boiler_py(texts, sep, min_doc_frac=0.05, min_docs=None):
    """Reference for curate.strip_boilerplate: literal-sep split, normalized
    line identity, drop EVERY occurrence of a line in >= threshold distinct
    docs (empty lines not exempt), rejoin with the literal sep."""
    import math
    from collections import defaultdict

    docs_per = defaultdict(set)
    for i, t in enumerate(texts):
        for line in (t or "").split(sep):
            docs_per[_norm_line(line)].add(i)
    thr = min_docs if min_docs is not None else max(2, math.ceil(len(texts) * min_doc_frac))
    boiler = {k for k, s in docs_per.items() if len(s) >= thr}
    return {
        i: sep.join(l for l in (t or "").split(sep) if _norm_line(l) not in boiler)
        for i, t in enumerate(texts)
    }


def _paragraph_dedup_sep_py(texts, sep):
    """_paragraph_dedup_py generalized to an arbitrary literal separator."""
    seen = set()
    out = {}
    for i, t in enumerate(texts):
        kept = []
        for p in (t or "").split(sep):
            n = _norm_line(p)
            if n == "":
                kept.append(p)
            elif n not in seen:
                seen.add(n)
                kept.append(p)
        out[i] = sep.join(kept)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.text(alphabet=" ab\n|.*E", max_size=40), min_size=2, max_size=10),
    st.sampled_from(_SEPS),
)
def test_strip_boilerplate_random_seps_matches_reference(spark, texts, sep):
    from log_parser_mind_spark.operators.curate import strip_boilerplate

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.text for r in strip_boilerplate(docs, sep=sep, min_docs=2).collect()}
    assert got == _strip_boiler_py(texts, sep, min_docs=2)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.text(alphabet=" ab\n|.*E", max_size=40), min_size=1, max_size=10),
    st.sampled_from(_SEPS),
)
def test_dedup_paragraphs_random_seps_matches_reference(spark, texts, sep):
    from log_parser_mind_spark.operators.curate import dedup_paragraphs

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.text for r in dedup_paragraphs(docs, sep=sep).collect()}
    assert got == _paragraph_dedup_sep_py(texts, sep)


def test_span_ops_pathological_corpora(spark):
    """All-boilerplate corpus: every doc reduces to '' but every ROW survives
    (downstream joins key on it). Single-paragraph ×N: exactly the global
    first occurrence keeps its text; replicas keep blank structure only."""
    from log_parser_mind_spark.operators.curate import dedup_paragraphs, strip_boilerplate

    same = spark.createDataFrame(
        [(i, "nav | footer") for i in range(6)], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in strip_boilerplate(same, sep=" | ").collect()}
    assert out == {i: "" for i in range(6)}

    solo = spark.createDataFrame(
        [(i, "only paragraph here") for i in range(5)], "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in dedup_paragraphs(solo).collect()}
    assert got[0] == "only paragraph here"
    assert all(got[i] == "" for i in range(1, 5))


# ---------------------------------------------------------------------------
# exact_contamination: Spark report == pure-Python n-gram set reference
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.text(alphabet=" abC\n", max_size=40), min_size=1, max_size=10),
    st.lists(st.text(alphabet=" abC\n", max_size=40), min_size=1, max_size=4),
    st.integers(min_value=1, max_value=4),
)
def test_exact_contamination_matches_python_reference(spark, corpus, block, n):
    """Per-doc (n_grams, n_hit_grams, contaminated) equals the brute-force
    set-intersection reference for arbitrary corpora — incl. empty texts,
    sub-n docs, and grams shared across case variants (identity is
    case-folded)."""
    from log_parser_mind_spark.operators.curate import exact_contamination

    def grams(t):
        toks = (t or "").lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bset = set().union(*(grams(t) for t in block))
    cdf = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(block)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.n_hit_grams, r.contaminated)
        for r in exact_contamination(cdf, bdf, n=n).collect()
    }
    assert set(got) == set(range(len(corpus)))
    for i, t in enumerate(corpus):
        g = grams(t)
        hits = len(g & bset)
        assert got[i] == (len(g), hits, hits >= 1), (i, t)


# ---------------------------------------------------------------------------
# cap_per_group: Spark keep set == pure-Python k-smallest reference
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2**40), st.sampled_from(["x", "y", None])),
        min_size=1,
        max_size=40,
        unique_by=lambda p: p[0],
    ),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=100),
)
def test_cap_per_group_matches_python_reference(spark, rows, k, salt):
    """The kept set equals the per-group k-smallest-(minstd, key) reference
    for arbitrary group assignments (incl. the NULL group) and salts."""
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        r.doc_id
        for r in sm.cap_per_group(df, k, group_col="source", key_col="doc_id", salt=salt)
        .select("doc_id")
        .collect()
    )
    by_group: dict = {}
    for key, grp in rows:
        by_group.setdefault(grp, []).append(key)
    want = sorted(
        key
        for members in by_group.values()
        for key in sorted(members, key=lambda i: (minstd_py(i, salt), i))[:k]
    )
    assert got == want


# ---------------------------------------------------------------------------
# sft_examples: Spark reshape == pure-Python prefix-sum reference
# ---------------------------------------------------------------------------


def _sft_py(rows, budget):
    """Reference: per conversation sorted by order, for each assistant turn
    include preceding turn s iff P(t-1) - P(s-1) <= budget (maximal whole-
    turn suffix); render 'role: text' newline-joined."""
    from collections import defaultdict

    convs = defaultdict(list)
    for conv, order, role, text in rows:
        convs[conv].append((order, role, text))
    out = {}
    for conv, turns in convs.items():
        turns.sort()
        ntoks = [len([t for t in (tx or "").lower().split() if t]) for _, _, tx in turns]
        pre = [0]
        for n in ntoks:
            pre.append(pre[-1] + n)
        for i, (order, role, text) in enumerate(turns):
            if role != "assistant":
                continue
            inc = [
                j for j in range(i) if pre[i] - pre[j] <= budget
            ]
            ctx = "\n".join(
                f"{turns[j][1] or ''}: {turns[j][2] or ''}" for j in inc
            )
            out[(conv, order)] = (
                ctx, text, len(inc), sum(ntoks[j] for j in inc)
            )
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 30),
            st.sampled_from(["user", "assistant", "system"]),
            st.one_of(st.none(), st.text(alphabet=" abC\n", max_size=30)),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.integers(min_value=1, max_value=8),
)
def test_sft_examples_matches_python_reference(spark, rows, budget):
    from log_parser_mind_spark.operators.prep import sft_examples

    df = spark.createDataFrame(rows, "conv_id int, turn_idx int, role string, text string")
    got = {
        (r.conv_id, r.target_turn_idx): (
            r.context, r.target, r.n_context_turns, r.n_context_tokens
        )
        for r in sft_examples(df, context_budget_tokens=budget).collect()
    }
    assert got == _sft_py(rows, budget)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # group
            st.floats(min_value=-100, max_value=100,     # score (ties likely
                      allow_nan=False, allow_infinity=False,
                      width=16),                         #  via 16-bit floats)
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_top_per_group_matches_python_reference(spark, rows, k):
    """top_per_group == sort-then-head per group under the exact
    (order DESC, key ASC) total order, for random groups/scores/k —
    including heavy score ties, negative scores, and k > group size."""
    data = [(f"g{g}", i, float(v)) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, doc_id long, v double")
    got = {(r.g, r.doc_id) for r in
           sm.top_per_group(df, k, group_col="g", order_col="v").collect()}

    want = set()
    by_g: dict[str, list] = {}
    for g, i, v in data:
        by_g.setdefault(g, []).append((i, v))
    for g, members in by_g.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        want.update((g, i) for i, _ in members[:k])
    assert got == want
