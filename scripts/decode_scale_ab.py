"""Decode-at-scale evidence (VERDICT r11 #6): the decode gates run at
driver sf, but PAYLOAD BYTES, not rows, are the decode stage's unit of
work. This script drives the image + audio + video decode twins at a
30x-equivalent payload volume and A/Bs `repartition_for_decode` ON vs
OFF, recording

  - wall-clock + decoded-bytes throughput per leg;
  - the heavy-tail balance: max/mean per-partition payload bytes the
    decode stage actually saw (the skew the repartition exists to fix).

The corpus is deliberately heavy-tailed AND the tail is CLUSTERED:
the N_ROWS // HEAVY_EVERY heavy payloads occupy contiguous leading ids,
the way raw media actually lands in a lake (one prefix/directory of
large originals next to thumbnails) -- so without the repartition they
all fall into the same source partitions and the decode stage's wall is
one task. Legs alternate across rounds so box drift cannot pick the
winner; row outputs are asserted identical.

Run: python scripts/decode_scale_ab.py [n_rows] [heavy_every] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from cell_kn_mvp_etl_results_spark.operators import multimodal as mm  # noqa: E402
from cell_kn_mvp_etl_results_spark.session import get_spark  # noqa: E402

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
HEAVY_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 2_500
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
# Heavy payloads sit ABOVE this and take the range-balanced branch;
# the default 32 MB is a lake-scale raw-media threshold -- at this
# harness scale heavies are ~6 MB, so the threshold scales with them
# (it is the operator parameter, not a constant of nature).
HEAVY_BYTES = 4 * 1024 * 1024
HEAVY_FRAMES = 24  # 24 inflated frames ~ 6.5 MB per heavy video

spark = get_spark(
    "decode-scale-ab",
    shuffle_partitions=32,
    extra_conf={"spark.sql.adaptive.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")


def heavy_media(kind: str):
    """Parametric media with a deterministic CLUSTERED heavy tail: the
    first N_ROWS // HEAVY_EVERY ids carry inflated payloads (contiguous
    leading ids -- the large-originals ingest prefix the module
    docstring describes; do NOT change this to a strided layout, the
    A/B's clustered-tail conclusion depends on it)."""
    from collections.abc import Iterator

    import pandas as pd

    ids = spark.range(N_ROWS).selectExpr("id AS media_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                heavy = mid < N_ROWS // HEAVY_EVERY  # clustered tail
                if kind == "video":
                    if heavy:
                        payload = mm.encode_pvf(
                            [_inflate_ppm(mid + j, 300) for j in range(HEAVY_FRAMES)]
                        )
                    else:
                        n = 2 + mid % 4
                        payload = mm.encode_pvf(
                            [mm.encode_ppm(mid * 7 + j * 101) for j in range(n)]
                        )
                elif kind == "image":
                    payload = _inflate_ppm(mid, 1400) if heavy else mm.encode_ppm(mid)
                else:
                    payload = _long_wav(mid) if heavy else mm.encode_wav(mid % 4096)
                rows.append((mid, kind, payload, "x"))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime"]
            )

    return ids.mapInPandas(gen, mm.MEDIA_SCHEMA)


def _inflate_ppm(mid: int, side: int = 300) -> bytes:
    # a large-but-valid P6: side x side deterministic pixels
    w = h = side
    n = w * h * 3
    header = f"P6\n{w} {h}\n255\n".encode()
    block = bytes((mid * 31 + k) % 256 for k in range(4096))
    body = (block * (n // 4096 + 1))[:n]
    return header + body


def _long_wav(mid: int) -> bytes:
    import io
    import struct
    import wave

    n = 3_000_000  # ~6 MB of 16-bit samples
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        block = struct.pack(
            "<4096h", *(((mid * 7 + i * 13) % 2001) - 1000 for i in range(4096))
        )
        wf.writeframes((block * (n // 4096 + 1))[: 2 * n])
    return buf.getvalue()


def partition_byte_stats(df) -> tuple[int, float, int]:
    # the OPERATOR's own diagnosis pass -- the bench must measure
    # balance through the same code the chooser applies its threshold
    # with (review r12), not a parallel reimplementation
    return mm.decode_balance_profile(df)


def run_leg(kind: str, media, repartitioned: bool):
    src = (
        mm.repartition_for_decode(
            media, n_partitions=32, heavy_bytes=HEAVY_BYTES
        )
        if repartitioned
        else media
    )
    fn = {
        "image": lambda d: mm.image_features(d, fake=False),
        "audio": lambda d: mm.audio_features(d, fake=False),
        "video": lambda d: mm.video_frame_features_fused(
            d, every_n=1, fake=False
        ),
    }[kind]
    out = fn(src)
    samples = []
    n_rows = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        n_rows = len(out.collect())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[RUNS // 2], n_rows


def main() -> None:
    for kind in ("image", "audio", "video"):
        media = heavy_media(kind).persist()
        total_bytes = media.agg(F.sum(F.length("payload"))).collect()[0][0]
        mx0, mean0, np0 = partition_byte_stats(media)
        mx1, mean1, np1 = partition_byte_stats(
            mm.repartition_for_decode(
                media, n_partitions=32, heavy_bytes=HEAVY_BYTES
            )
        )
        res = {}
        # alternate leg order across two rounds
        for rnd in (0, 1):
            order = (False, True) if rnd == 0 else (True, False)
            for rep in order:
                t, n = run_leg(kind, media, rep)
                res.setdefault(rep, []).append((t, n))
        n_plain = {n for (_, n) in res[False]} | {n for (_, n) in res[True]}
        assert len(n_plain) == 1, n_plain
        t_off = min(t for t, _ in res[False])
        t_on = min(t for t, _ in res[True])
        print(
            f"{kind}: bytes={total_bytes/1e6:.1f}MB rows_out={n_plain.pop()} "
            f"off={t_off:.2f}s on={t_on:.2f}s "
            f"thrpt_off={total_bytes/1e6/t_off:.0f}MB/s "
            f"thrpt_on={total_bytes/1e6/t_on:.0f}MB/s | "
            f"part-bytes max/mean: "
            f"source {mx0/1e6:.1f}/{mean0/1e6:.1f}MB (n={np0}) -> "
            f"repartitioned {mx1/1e6:.1f}/{mean1/1e6:.1f}MB (n={np1})"
        )
        media.unpersist()


if __name__ == "__main__":
    main()
