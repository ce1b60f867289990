"""Certified-batched BPE at a real vocabulary (VERDICT r8 #7).

The prior 512-merge certification ran over the template-bound testdata
vocabulary (a few hundred word types). This run trains on a
deterministic morphology-shaped corpus with >= 16k distinct words
(sources/synthetic.natural_vocab_corpus) and measures:

  1. batched training to >= 4096 merges: rounds vs merges (the claim
     is rounds << merges and the per-merge round cost stays flat);
  2. first-512 identity: the batched run's first 512 merges equal a
     sequential (batch=1) 512-merge run on the same corpus, row for
     row -- the certification contract at a vocabulary where ties and
     created-pair interference actually occur.

Run: python scripts/bpe_largevocab_run.py [n_merges] [batch] [n_words] [n_tokens]
Defaults: 4096 64 16384 400000.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from cell_kn_mvp_etl_results_spark.operators.bpe import bpe_train_merges
from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.synthetic import natural_vocab_corpus

n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
n_words = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
n_tokens = int(sys.argv[4]) if len(sys.argv) > 4 else 400_000

spark = get_spark(
    "bpe-largevocab",
    shuffle_partitions=32,
    extra_conf={
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.constraintPropagation.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

corpus = natural_vocab_corpus(spark, n_words=n_words, n_tokens=n_tokens).persist()
n_docs = corpus.count()
from pyspark.sql import functions as F  # noqa: E402

vocab_size = (
    corpus.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
    .filter(F.col("w") != "")
    .distinct()
    .count()
)
print(f"corpus: {n_docs} docs, {n_tokens} tokens, {vocab_size} distinct words", flush=True)

stats: dict = {}
t0 = time.perf_counter()
batched = bpe_train_merges(
    corpus, "text", n_merges=n_merges, batch=batch, stats=stats
).collect()
wall_b = time.perf_counter() - t0
rounds = stats["rounds"]
print(
    f"BATCHED  n_merges={n_merges} batch={batch}: learned={len(batched)} "
    f"rounds={rounds} ({len(batched) / max(1, rounds):.1f} merges/round) "
    f"wall={wall_b:.1f}s ({wall_b / max(1, rounds):.3f}s/round, "
    f"{wall_b / max(1, len(batched)):.3f}s/merge)",
    flush=True,
)

# First-512 identity vs sequential (batch=1).
t0 = time.perf_counter()
seq_stats: dict = {}
seq = bpe_train_merges(
    corpus, "text", n_merges=512, batch=1, stats=seq_stats
).collect()
wall_s = time.perf_counter() - t0
print(
    f"SEQUENTIAL n_merges=512: learned={len(seq)} rounds={seq_stats['rounds']} "
    f"wall={wall_s:.1f}s ({wall_s / max(1, len(seq)):.3f}s/merge)",
    flush=True,
)
b512 = [tuple(r) for r in batched[:512]]
s512 = [tuple(r) for r in seq]
if b512 == s512:
    print("IDENTITY: first 512 batched merges == sequential, row for row")
else:
    diff = next(i for i, (a, b) in enumerate(zip(b512, s512)) if a != b)
    print(f"MISMATCH at step {diff}: batched={b512[diff]} sequential={s512[diff]}")
    sys.exit(1)
print("last 3 batched:", [tuple(r)[:4] for r in batched[-3:]])
spark.stop()
