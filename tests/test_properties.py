"""Property-based tests (hypothesis) for operator invariants -- a layer
the reference's suite lacks entirely (SURVEY.md section 5: no randomized
testing). Each property batches all generated inputs into one DataFrame
so a property costs one Spark job, not one per example.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.functions.money import cents, money
from cell_kn_mvp_etl_results_spark.functions.text import hyphenate, tokens
from cell_kn_mvp_etl_results_spark.operators import dedup as dd

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
texts = st.lists(words, min_size=1, max_size=30).map(" ".join)


@SET
@given(st.lists(texts, min_size=2, max_size=8))
def test_jaccard_bounds_and_self_similarity(spark, docs):
    rows = list(enumerate(docs)) + [(len(docs), docs[0])]  # force a dup pair
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.0).collect()
    for r in out:
        assert 0.0 < r.jaccard <= 1.0
        assert r.inter <= r.union_sz
    dup = [r for r in out if (r.id_a, r.id_b) == (0, len(docs))]
    assert dup and dup[0].jaccard == 1.0  # identical docs


@SET
@given(st.lists(texts, min_size=2, max_size=6))
def test_minhash_estimate_bounds_and_exact_dup(spark, docs):
    # ensure at least one doc has a 3-shingle
    docs = [d + " x y z" for d in docs]
    rows = list(enumerate(docs)) + [(len(docs), docs[0])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.minhash_lsh_pairs(df, "doc_id", "text").collect()
    for r in out:
        assert 0.0 <= r.est_jaccard <= 1.0
    dup = [r for r in out if (r.id_a, r.id_b) == (0, len(docs))]
    assert dup and dup[0].est_jaccard == 1.0


@SET
@given(st.lists(texts, min_size=1, max_size=10))
def test_exact_dedup_partitions_input(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    groups = dd.exact_dedup_groups(df, "doc_id", "text").collect()
    assert sum(g.n_docs for g in groups) == len(docs)
    keepers = [g.keeper for g in groups]
    assert len(keepers) == len(set(keepers))


@SET
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20))
def test_hyphenate_idempotent(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(
        hyphenate("v").alias("once"), hyphenate(hyphenate("v")).alias("twice")
    ).collect()
    for r in out:
        assert r.once == r.twice
        assert "  " not in r.once and "_" not in r.once


@SET
@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
def test_tokens_never_empty_strings(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    for r in df.select(tokens("v").alias("t")).collect():
        assert "" not in r.t


@SET
@given(
    st.lists(
        st.integers(min_value=-(10**12), max_value=10**12), min_size=1, max_size=20
    )
)
def test_cents_money_roundtrip(spark, cents_vals):
    # any 2-decimal dollar amount survives the cents round-trip exactly
    rows = [(c / 100.0,) for c in cents_vals]
    df = spark.createDataFrame(rows, "v double")
    out = df.select(F.col("v"), money(cents("v")).alias("back")).collect()
    for r in out:
        assert math.isclose(r.back, r.v, rel_tol=0, abs_tol=0), (r.v, r.back)


@SET
@given(st.lists(texts, min_size=1, max_size=8))
def test_winnow_matches_pure_python_on_random_text(spark, docs):
    """winnow_fingerprints == the pure-Python MOSS reference for any
    normalized text (same md5-48 hashing, k=5, window=4)."""
    from test_llm_ops import _winnow_ref

    from cell_kn_mvp_etl_results_spark.operators import textanalysis as ta

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.fps
        for r in df.select(
            "doc_id", ta.winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    for i, t in rows:
        assert got[i] == _winnow_ref(t), t


@SET
@given(st.lists(texts, min_size=1, max_size=8))
def test_repetition_bounds_and_extremes(spark, docs):
    """dup_frac in [0, 1); a doc of one repeated token approaches 1;
    n_distinct <= n_grams always."""
    from cell_kn_mvp_etl_results_spark.operators import textanalysis as ta

    rows = list(enumerate(docs)) + [(len(docs), "w " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in ta.repetition_score(df, "doc_id", "text").collect()}
    for r in out.values():
        assert 0 <= r.n_distinct <= r.n_grams
        assert 0.0 <= r.dup_frac < 1.0
    rep = out[len(docs)]  # 29 bigrams, 1 distinct
    assert rep.n_distinct == 1 and rep.dup_frac == (29 - 1) / 29


@SET
@given(st.lists(texts, min_size=1, max_size=6), st.integers(0, 3))
def test_chunk_reconstruction(spark, docs, overlap):
    """Chunks reassemble to the exact original text for any width and
    overlap; chunk counts match the closed form."""
    from cell_kn_mvp_etl_results_spark.operators import textanalysis as ta

    width = 5
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ta.chunk_text(df, "doc_id", "text", chunk_chars=width, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.id, {})[r.chunk_idx] = r.chunk
    step = width - overlap
    for i, t in rows:
        chunks = [by_doc[i][j] for j in sorted(by_doc[i])]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == t, (t, chunks)
        expected_n = max(-(-max(len(t) - overlap, 0) // step), 1) if t else 1
        assert len(chunks) == expected_n or t == ""


@SET
@given(
    st.lists(
        st.tuples(st.integers(-500, 500), st.integers(0, 200)), min_size=1, max_size=25
    ),
    st.lists(st.integers(-550, 550), min_size=1, max_size=25),
    st.sampled_from([3, 16, 100]),
)
def test_interval_join_equals_naive(spark, ivs, pts, width):
    """Bucketized interval join == naive range join for arbitrary
    intervals (including empty/negative/spanning-many-buckets) at any
    bucket width."""
    from cell_kn_mvp_etl_results_spark.operators.intervals import interval_join

    points = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "pid long, p long"
    ).withColumn("k", F.lit("x"))
    intervals = spark.createDataFrame(
        [(1000 + i, lo, lo + span) for i, (lo, span) in enumerate(ivs)],
        "iid long, lo long, hi long",
    ).withColumn("k", F.lit("x"))
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, ["k"], "p", "lo", "hi", bucket_width=width
        ).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in points.join(intervals, "k")
        .filter((F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")))
        .collect()
    )
    assert got == naive


@SET
@given(st.lists(st.integers(0, 300), min_size=1, max_size=40), st.sampled_from([1, 2]))
def test_prefix_sum_is_a_permutation_prefix(spark, sizes, digits):
    """Two-level prefix sum: positions are exactly the prefix sums of
    sizes in (md5, id) order -- total coverage, no gaps or overlaps."""
    from cell_kn_mvp_etl_results_spark.operators.packing import global_prefix_sum

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    rows = global_prefix_sum(df, "doc_id", "n_tokens", digits).collect()
    by_pos = sorted(rows, key=lambda r: r.pos)
    acc = 0
    for r in by_pos:
        assert r.pos == acc
        acc += r.n_tokens
    assert acc == sum(sizes)


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=1, max_size=40
    )
)
def test_triangle_counts_match_bruteforce(spark, raw_edges):
    """Degree-ordered counting == brute-force enumeration on random
    graphs (self-loops and duplicates tolerated by canonicalization)."""
    from itertools import combinations

    from cell_kn_mvp_etl_results_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(raw_edges, "id_a long, id_b long")
    got = {r.id: r.n_triangles for r in triangle_counts(df).collect()}

    adj = set()
    for a, b in raw_edges:
        if a != b:
            adj.add((min(a, b), max(a, b)))
    nodes = sorted({x for e in adj for x in e})
    expect: dict[int, int] = {}
    for u, v, w in combinations(nodes, 3):
        if (u, v) in adj and (v, w) in adj and (u, w) in adj:
            for x in (u, v, w):
                expect[x] = expect.get(x, 0) + 1
    assert got == expect


@SET
@given(st.lists(st.tuples(st.integers(1, 30), st.integers(0, 50)), min_size=1, max_size=25))
def test_balanced_shards_is_permutation_and_partition_invariant(spark, rows):
    from cell_kn_mvp_etl_results_spark.operators.packing import balanced_shards

    rows = [(i, n) for i, (_, n) in enumerate(rows)]  # unique ids
    df = spark.createDataFrame(rows, "doc_id long, n long")
    a = sorted(
        (r.id, r.rnk, r.shard)
        for r in balanced_shards(df, "doc_id", F.col("n"), 4).collect()
    )
    b = sorted(
        (r.id, r.rnk, r.shard)
        for r in balanced_shards(
            df.repartition(5), "doc_id", F.col("n"), 4
        ).collect()
    )
    assert a == b  # deterministic under partitioning
    ranks = sorted(r for _, r, _ in a)
    assert ranks == list(range(1, len(rows) + 1))  # rank is a permutation
    assert all(0 <= s < 4 for _, _, s in a)


@SET
@given(st.lists(texts, min_size=1, max_size=6))
def test_duplicate_spans_shape_invariants(spark, docs):
    """Spans are >= k tokens long, sorted, non-overlapping per doc, and
    invariant under repartitioning."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = sorted(
        (r.id, r.span_start, r.span_end, r.n_grams)
        for r in dd.duplicate_spans(df, "doc_id", "text", k=2).collect()
    )
    out2 = sorted(
        (r.id, r.span_start, r.span_end, r.n_grams)
        for r in dd.duplicate_spans(
            df.repartition(3), "doc_id", "text", k=2
        ).collect()
    )
    assert out == out2
    last_end: dict[int, int] = {}
    for doc, s, e, n in out:
        assert e - s + 1 >= 2 and n >= 1
        if doc in last_end:
            assert s > last_end[doc] + 2  # merged if within gap <= k
        last_end[doc] = e


@SET
@given(st.lists(texts, min_size=2, max_size=8))
def test_prefix_filter_is_lossless(spark, docs):
    """Prefix filtering must find EXACTLY the pairs the full inverted
    index finds at the same threshold -- the lossless guarantee that
    distinguishes it from the posting cap."""
    docs = [d + " p q r" for d in docs] + [docs[0] + " p q r"]  # force a dup
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    for t in (0.3, 0.6, 0.9):
        full = {
            (r.id_a, r.id_b, r.inter, r.union_sz)
            for r in dd.jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=t, max_posting=None
            ).collect()
        }
        pre = {
            (r.id_a, r.id_b, r.inter, r.union_sz)
            for r in dd.jaccard_pairs_prefix(
                df, "doc_id", "text", n=2, threshold=t
            ).collect()
        }
        assert pre == full, f"threshold {t}"


@SET
@given(
    st.lists(texts, min_size=1, max_size=5),
    st.lists(texts, min_size=1, max_size=4),
)
def test_ngram_lm_matches_python_mirror(spark, train_docs, score_docs):
    """Spark bigram stupid-backoff scoring equals a pure-Python mirror
    of the same integer floor-log2 arithmetic, over random corpora --
    exercises seen/backoff/OOV branches beyond the fixed examples."""
    from collections import Counter

    from cell_kn_mvp_etl_results_spark.operators import textanalysis as ta

    def toks(t):
        return t.lower().split()

    uni = Counter(w for t in train_docs for w in toks(t))
    big = Counter(
        (ws[i], ws[i + 1])
        for t in train_docs
        for ws in [toks(t)]
        for i in range(len(ws) - 1)
    )
    n_total = sum(uni.values())
    bl = lambda x: x.bit_length() - 1  # floor(log2(x)) for x >= 1  # noqa: E731

    def cost(w1, w2):
        if (w1, w2) in big:
            return bl(uni[w1]) - bl(big[(w1, w2)])
        if w2 in uni:
            return ta.LM_BACKOFF_PENALTY + (bl(n_total) - bl(uni[w2]))
        return ta.LM_OOV_COST

    expected = {}
    for i, t in enumerate(score_docs):
        ws = toks(t)
        if len(ws) < 2:
            continue
        cs = [cost(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        expected[i] = (len(cs), sum(cs))

    train = spark.createDataFrame(
        list(enumerate(train_docs)), "doc_id long, text string"
    )
    score = spark.createDataFrame(
        list(enumerate(score_docs)), "doc_id long, text string"
    )
    pair_m, uni_m = ta.ngram_lm_model(train, "doc_id", "text")
    got = {
        r.id: (r.n_bigrams, r.sum_cost)
        for r in ta.ngram_lm_score(score, "doc_id", "text", pair_m, uni_m).collect()
    }
    assert got == expected


# Tiny alphabet + short words force the adversarial BPE cases: count
# ties everywhere, run pairs (a,a), overlapping pairs sharing symbols,
# and newly-created pairs that outrank remaining candidates -- exactly
# the cases the batched trainer's certification rules must refuse to
# accept early (operators/bpe._accept_batch).
_bpe_words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=10
).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_bpe_words, st.integers(min_value=2, max_value=6))
def test_bpe_batched_is_certified_sequential(spark, text, n_merges):
    from cell_kn_mvp_etl_results_spark.operators.bpe import bpe_train_merges

    df = spark.createDataFrame([(text,)], "text string")
    seq = [tuple(r) for r in bpe_train_merges(df, n_merges=n_merges).collect()]
    bat = [
        tuple(r)
        for r in bpe_train_merges(df, n_merges=n_merges, batch=4).collect()
    ]
    assert seq == bat


# --- r11 real-codec round-trip properties (pure Python: no Spark job;
# the distributed shape is covered by the decode gates and the
# streaming twin -- these pin the byte-level parsers over the whole
# parameter space, not just the gate's doc_id range). ---

idents = st.integers(min_value=0, max_value=2**62 - 1)


@settings(max_examples=50, deadline=None)
@given(idents)
def test_ppm_roundtrip_property(ident):
    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    w, h, luma = mm.decode_image(mm.encode_ppm(ident))
    ew, eh = 4 + ident % 13, 3 + ident % 7
    n = ew * eh * 3
    assert (w, h) == (ew, eh)
    assert luma == sum((ident * 31 + k) % 256 for k in range(n)) // n


@settings(max_examples=50, deadline=None)
@given(idents)
def test_bmp_roundtrip_property(ident):
    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    w, h, luma = mm.decode_image(mm.encode_bmp(ident))
    ew, eh = 3 + ident % 11, 2 + ident % 5
    n = ew * eh * 3
    assert (w, h) == (ew, eh)
    assert luma == sum((ident * 17 + k) % 256 for k in range(n)) // n


@settings(max_examples=50, deadline=None)
@given(idents)
def test_wav_roundtrip_property(ident):
    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    dur, rms = mm.decode_audio(mm.encode_wav(ident))
    n = 64 + ident % 32
    samples = [((ident * 7 + i * 13) % 2001) - 1000 for i in range(n)]
    assert dur == n // 8
    assert rms == math.isqrt(sum(s * s for s in samples) // n)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1),
        min_size=1,
        max_size=200,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_decode_arbitrary_pcm(samples, rate):
    # decode is not tied to the fixture generator: any 16-bit mono PCM
    # stream round-trips duration and isqrt-RMS exactly
    import io
    import struct
    import wave

    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    dur, rms = mm.decode_audio(buf.getvalue())
    assert dur == len(samples) * 1000 // rate
    assert rms == math.isqrt(
        sum(s * s for s in samples) // len(samples)
    )


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=9),
    st.binary(min_size=0, max_size=64),
    st.booleans(),
)
def test_ppm_decode_arbitrary_pixels(w, h, seed, with_comment):
    # arbitrary pixel bytes and an optional header comment: the parser
    # is grammar-driven, not fixture-driven
    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    n = w * h * 3
    body = bytes((seed + bytes(range(256)))[k % (len(seed) + 256)] for k in range(n))
    comment = b"# a comment line\n" if with_comment else b""
    payload = b"P6\n" + comment + f"{w} {h}\n255\n".encode() + body
    got = mm.decode_image(payload)
    assert got == (w, h, sum(body) // n)


@settings(max_examples=50, deadline=None)
@given(idents)
def test_pvf_roundtrip_property(ident):
    # r12: the video container over the full parameter space -- frame
    # count from the header, each frame located by its length prefix
    # and byte-decoded to the closed-form mean luma.
    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    payload = mm.encode_video(ident)
    n = mm.pvf_frame_count(payload)
    assert n == 2 + ident % 4
    for j in range(n):
        e = ident * 7 + j * 101
        w, h = 4 + e % 13, 3 + e % 7
        npx = w * h * 3
        want = sum((e * 31 + k) % 256 for k in range(npx)) // npx
        assert mm.decode_frame(payload, j) == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=6),
            st.binary(min_size=0, max_size=32),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_pvf_decode_arbitrary_frames(frames):
    # decode is not tied to the fixture generator: ANY list of valid
    # P6 frames (arbitrary sizes and pixel bytes, including mixed
    # dimensions across frames) round-trips through the container
    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    blobs, wants = [], []
    for w, h, seed in frames:
        n = w * h * 3
        body = bytes(
            (seed + bytes(range(256)))[k % (len(seed) + 256)]
            for k in range(n)
        )
        blobs.append(b"P6\n" + f"{w} {h}\n255\n".encode() + body)
        wants.append(sum(body) // n)
    payload = mm.encode_pvf(blobs)
    assert mm.pvf_frame_count(payload) == len(frames)
    for j, want in enumerate(wants):
        assert mm.decode_frame(payload, j) == want
