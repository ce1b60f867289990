"""Distributed BPE (byte-pair-encoding) merge training -- the tokenizer
side of a training-data pipeline, as an iterative Spark job.

Canonical BPE training (Sennrich et al. ACL'16): start from characters,
repeatedly count adjacent symbol pairs over the (frequency-weighted)
word vocabulary, merge the most frequent pair into a new symbol, and
record the merge sequence. The merge list IS the tokenizer: applying the
merges in order to new text reproduces the learned segmentation.

Determinism doctrine: ties in the pair argmax break on the
lexicographically smallest (left, right) pair -- a total order, so the
learned merges are a pure function of the corpus. Merge application
itself is made engine-portable by a STRING-REWRITE representation:
each word's symbol sequence is stored as ``\\x1f s \\x1f`` units
concatenated (every symbol individually fenced), and applying a merge
is one literal ``replace()`` of ``\\x1f l \\x1f\\x1f r \\x1f`` with
``\\x1f lr \\x1f``. Left-to-right non-overlapping replacement is exactly
the canonical single-pass BPE merge ([a,a,a] -> [aa,a]), the fencing
makes a symbol boundary impossible to confuse with symbol content
([aa,a] never matches the (a,a) pattern), and Spark's ``replace`` and
DuckDB's ``replace`` share these semantics bit-for-bit (validated in
tests) -- which is what lets an unrolled-CTE oracle gate the whole
training loop.

Scale shape per merge round: one pair-count aggregation whose key space
is the ACTIVE PAIR VOCABULARY (not the corpus -- words pre-aggregate to
(word, freq) once, so a billion-document corpus costs the same per
round as its distinct-word vocabulary), one 1-row argmax collect (the
irreducible synchronization of sequential BPE -- same driver-traffic
contract as clustering.kmeans_integer), and one map-side replace over
the vocabulary. The vocabulary relation is re-persisted per round so
round r never recomputes rounds 1..r-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bpe_train_merges", "bpe_apply", "SEP"]

SEP = "\x1f"  # unit separator: fences every symbol in the seq encoding

# Truncate the vocab DataFrame's lineage every this-many merge rounds
# (one replace() node accretes per round otherwise).
_CHECKPOINT_EVERY = 16


def _initial_seq(word) -> F.Column:
    """'abc' -> '\\x1fa\\x1f\\x1fb\\x1f\\x1fc\\x1f' (every char fenced)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(
        F.lit(SEP), F.array_join(chars, SEP + SEP), F.lit(SEP)
    )


def _merged_seq(merges: list[tuple]) -> F.Column:
    """The canonical-apply segmentation of ``word`` under a trained
    merge list: ``_initial_seq`` rewritten by one literal ``replace``
    per merge, in training order — reproduces the learned segmentation
    exactly (module docstring; shared by ``bpe_apply`` and the
    pretrained paths of ``bpe_segment_counts``/q_tokenize_pack)."""
    ordered = sorted(merges, key=lambda m: m[0])
    seq = _initial_seq(F.col("word"))
    for m in ordered:
        l, r = m[1], m[2]
        seq = F.replace(
            seq,
            F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
            F.lit(f"{SEP}{l}{r}{SEP}"),
        )
    return seq


def _tokens(df: DataFrame, text_col: str, extra_cols: tuple = ()) -> DataFrame:
    """Whitespace tokenization shared by train and apply. Strips the
    U+001F fence character from the text FIRST: a token containing SEP
    would make symbol content indistinguishable from symbol boundaries
    in the seq encoding (silently corrupting merges in both engines
    identically, so the oracle gate could never catch it). The DuckDB
    oracle (plans/extended2._bpe_oracle) applies the same replace."""
    return df.select(
        *extra_cols,
        F.explode(
            F.split(
                F.trim(F.lower(F.translate(F.col(text_col), SEP, ""))),
                r"\s+",
            )
        ).alias("word"),
    ).filter(F.col("word") != "")


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_word_syms: int = 64,
    batch: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a document corpus.

    Returns the merge table -- one row per learned merge:
    (step, left, right, merged, pair_count), step 1-based in learning
    order. ``pair_count`` is the frequency-weighted adjacent-pair count
    the merge won with. ``max_word_syms`` bounds the per-word pair
    enumeration (words longer than that contribute their first
    ``max_word_syms`` symbols' pairs; tokens that long are noise).

    ``batch`` (VERDICT r7 #6): with batch=1 (default) this is one
    recount + one 1-row argmax collect per merge.  With batch=B>1, each
    recount round accepts up to B merges from the count-ordered
    candidate list under the certification rules in ``_accept_batch``
    -- and the OUTPUT IS IDENTICAL to batch=1 for every corpus and
    every n_merges, because a round only accepts merges whose
    sequential rank is provable from the fetched counts (candidates are
    consecutive, non-interfering by the shared-symbol-instance
    analysis, and strictly above every possible newly-created pair
    count) and ends at the first uncertifiable candidate.  Batching
    only changes the driver-sync count: n_merges argmax collects become
    one collect per round, with rounds << n_merges on natural
    vocabularies (at 30x, 118 sequential collects were 29 s of wall,
    BENCH_NOTES r7).  Equality is pinned by construction-independent
    tests (tests/test_bpe.py) and the unrolled-CTE oracle gates the
    sequential semantics itself.

    ``stats``, when a dict is passed, is filled with
    {"rounds": <recount rounds run>} so callers can observe the
    batching's driver-sync savings (BENCH_NOTES rounds-vs-merges rows).
    """
    merges, _vocab = _train(df, text_col, n_merges, max_word_syms, batch, stats)
    return df.sparkSession.createDataFrame(
        merges,
        "step long, left string, right string, merged string, pair_count long",
    )


def _train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    max_word_syms: int,
    batch: int = 1,
    stats: dict | None = None,
) -> tuple[list[tuple], DataFrame]:
    """Run the merge-learning loop; returns (merge rows, final vocab
    DataFrame with (word, seq, freq) -- the trained segmentation of
    every corpus word)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    words = (
        _tokens(df, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", _initial_seq(F.col("word")).alias("seq"), "freq")
        .persist()
    )
    merges: list[tuple] = []
    vocab = words
    superseded: DataFrame | None = None
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        syms = F.split(
            F.expr("substring(seq, 2, length(seq) - 2)"), SEP + SEP
        )
        pair_idx = F.sequence(
            F.lit(1), F.least(F.size(syms) - 1, F.lit(max_word_syms - 1))
        )
        pairs = (
            vocab.filter(F.size(syms) >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.struct(
                            F.element_at(syms, i).alias("l"),
                            F.element_at(syms, i + F.lit(1)).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        # Candidate overfetch: the exactness guard needs headroom both
        # to keep accepting and to observe the adjacent-pair maxima it
        # bounds new-pair counts with; correctness never depends on the
        # fetch size (a short fetch only ends rounds earlier).
        want = min(batch, n_merges - len(merges))
        fetch = 1 if want == 1 else max(want * 4, 64)
        top = pairs.orderBy(F.desc("cnt"), "l", "r").limit(fetch).collect()
        # The collect above materialized the CURRENT vocab's cache, so
        # the round it was derived from is now dead weight -- unpersist
        # it instead of leaking one cached relation per merge round
        # (matters at real tokenizer merge counts, n_merges in the
        # hundreds; same loop-state hygiene as graph.pagerank_integer).
        if superseded is not None:
            superseded.unpersist()
            superseded = None
        if not top:
            break
        accepted = _accept_batch(top, want, len(merges), fetched_all=len(top) < fetch)
        merges.extend(accepted)
        seq = F.col("seq")
        for _step, l, r, _m, _cnt in accepted:
            seq = F.replace(
                seq,
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            )
        nxt = vocab.select("word", seq.alias("seq"), "freq")
        # Lineage would otherwise grow one replace() per accepted merge,
        # making the Catalyst analysis cost of round r quadratic over
        # the run; a periodic localCheckpoint truncates the plan so
        # 256-merge training keeps a flat per-round cost (measured,
        # BENCH_NOTES).
        if rounds % _CHECKPOINT_EVERY == 0:
            nxt = nxt.localCheckpoint(eager=False)
        superseded, vocab = vocab, nxt.persist()
    if stats is not None:
        stats["rounds"] = rounds
    return merges, vocab


def _accept_batch(
    top: list, want: int, n_done: int, fetched_all: bool
) -> list[tuple]:
    """Accept the longest prefix of the count-ordered candidate list
    that PROVABLY matches sequential BPE, stopping the round at the
    first candidate whose sequential rank cannot be certified from the
    fetched counts alone.  ``top`` rows are (l, r, cnt) sorted by
    (cnt desc, l, r); returns (step, left, right, merged, cnt) rows.

    Exactness argument (each clause maps to a guard below):
      * merging (a, b) changes the count of an existing pair (c, d)
        iff they can share a symbol INSTANCE: d == a (an occurrence
        [c, a] whose a is consumed by a following b) or c == b (an
        occurrence [b, d] whose b was consumed by a preceding a).  A
        candidate clean of both against every earlier accept still
        holds its true sequential count, and candidates are consecutive
        in sort order, so it is the argmax among OLD pairs.  The first
        interfering candidate ends the round: its decayed count is
        unknowable without a recount, and every later candidate sorts
        below it, so nothing further can be certified either.
      * merging (a, b) CREATES pairs (x, ab) / (ab, y), each new
        occurrence coming from an occurrence of (x, a) / (b, y) inside
        an occurrence of (a, b) -- so its count is <= min(cnt(a,b),
        cnt(adjacent pair)).  A candidate is certified only while its
        count strictly exceeds that bound for every earlier accept
        (ties lose certification: a tied new pair could win the lex
        order).  Adjacent pairs outside the fetched list are bounded
        by the fetch floor (the smallest fetched count); when the
        fetch drained the whole pair table there is no floor.
    """
    floor = 0 if fetched_all else int(top[-1].cnt)
    accepted: list[tuple] = []  # (step, l, r, merged, cnt)
    new_pair_bounds: list[int] = []  # per accept: max possible created-pair count
    for row in top:
        if len(accepted) >= want:
            break
        c, d, cnt = row.l, row.r, int(row.cnt)
        if any(d == a or c == b for _s, a, b, _m, _c in accepted):
            break
        if any(cnt <= bound for bound in new_pair_bounds):
            break
        maxadj = max(
            (
                int(r2.cnt)
                for r2 in top
                if (r2.r == c or r2.l == d)
                # the candidate itself spawns nothing through itself --
                # EXCEPT a run pair (c == d), whose own occurrences
                # chain ([a,a,a,a] -> (aa,aa)): keep it then.
                and not (c != d and r2.l == c and r2.r == d)
            ),
            default=0,
        )
        accepted.append((n_done + len(accepted) + 1, c, d, c + d, cnt))
        new_pair_bounds.append(min(cnt, max(maxadj, floor)))
    return accepted


def bpe_segment_counts(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n_merges: int = 8,
    max_word_syms: int = 64,
    merges: list[tuple] | None = None,
) -> DataFrame:
    """Apply-side of the tokenizer: train ``n_merges`` merges, segment
    the corpus under them, and report per-``group_col``
    (group, n_words, n_subwords) -- the token-budget accounting a
    mixture/packing stage consumes. Application is VOCABULARY-level
    (each distinct word segments once; occurrences join the result),
    so per-round and apply cost scale with the vocabulary, not corpus
    bytes.

    ``merges``: a PRE-TRAINED merge list (plans/models.py registry) --
    the serving path: segmentation becomes the canonical-apply replace
    chain over the distinct words (``_merged_seq``), zero driver-synced
    training rounds per call; row-identical to inline training because
    canonical apply reproduces the learned segmentation exactly."""
    if merges is None:
        _merges, vocab = _train(df, text_col, n_merges, max_word_syms)
    else:
        vocab = (
            _tokens(df, text_col)
            .select("word")
            .distinct()
            .select("word", _merged_seq(merges).alias("seq"))
        )
    n_sub = F.size(
        F.split(F.expr("substring(seq, 2, length(seq) - 2)"), SEP + SEP)
    )
    seg = vocab.select("word", n_sub.cast("long").alias("n_sub"))
    toks = _tokens(df, text_col, (F.col(group_col).alias("grp"),))
    return (
        toks.join(seg, "word")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .orderBy(group_col)
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment a corpus under a PRE-TRAINED merge list -- the production
    apply path (training happens once, offline; a 100 TB tokenization
    job ships only the merge table). ``merges`` rows are
    (step, left, right[, ...]) as returned by ``bpe_train_merges``
    (extra columns ignored).

    Returns (id_col, subwords array<string>, n_subwords) per document
    row, whitespace-pretokenized like training and in document token
    order (position-keyed reassembly -- collect_list alone would be
    shuffle-order-dependent). Application is VOCABULARY-level: each
    distinct word is segmented once by a chain of ``n_merges`` literal
    map-side replaces (zero shuffle beyond the word-dedup agg), then
    occurrences re-join the segmentation -- corpus bytes never pass
    through the rewrite chain. The merge chain is applied in training
    order, which reproduces the learned segmentation exactly (canonical
    BPE apply semantics).
    """
    seq = _merged_seq(merges)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(
                F.trim(F.lower(F.translate(F.col(text_col), SEP, ""))),
                r"\s+",
            )
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    vocab = toks.select("word").distinct().select("word", seq.alias("seq"))
    subs = F.split(F.expr("substring(seq, 2, length(seq) - 2)"), SEP + SEP)
    seg = vocab.select("word", subs.alias("subwords"))
    by_pos = F.array_sort(F.collect_list(F.struct("pos", "subwords")))
    return (
        toks.join(seg, "word")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.flatten(
                F.transform(by_pos, lambda s: s["subwords"])
            ).alias("subwords"),
            F.sum(F.size("subwords")).cast("long").alias("n_subwords"),
        )
    )
