#!/usr/bin/env python
"""Round-11 multimodal-kernel scale ladder.

The real decode kernels (PNG, baseline+progressive JPEG, GIF, BMP,
WAV, MP3, MP4, AVI) run per payload inside Arrow-batched
``mapInPandas`` — the scale question is whether throughput holds as
the ASSET COUNT grows (the decode pass must be embarrassingly
parallel: no driver traffic, no skewed stage, per-task cost flat).

This ladder synthesizes asset tables from the sf0.1 documents fixture
(payloads generated per row INSIDE the executors via the fixture
encoders — the driver never touches a payload), then times the three
real feature passes end-to-end:

- ``image``  — extract_features(fake=False) over a PNG/JPEG/GIF/BMP/TIFF/
  BMP16/ICO/PNM/TGA/QOI/PCX mix (round 13: 16-bit RGB555/565 alternating;
  favicons wrapping PNG or DIB payloads; Netpbm binary/ASCII; TGA
  RLE bottom-up)
- ``audio``  — extract_audio_features over a WAV/MP3/Ogg/FLAC-stub/
  FLAC-PCM/G.711/IMA-ADPCM mix (round 13: real rice+LPC streams and
  the telephony codecs in the loop)
- ``video``  — extract_video_features over an AVI/MP4/GIF-animation/
  MKV mix (round 13: the graphic-control delay walk in the loop)
- ``mjpeg``  — sample_frames(fake=False) PIXEL decode over MJPEG AVIs
  (round 12: per-frame JPEG entropy decode, the heaviest kernel —
  half the assets ship DHT-less so the Annex-K splice is in the loop)
- ``imagefp`` — image_fingerprints over the image mix (round 12: the
  cross-format dedup key pass — full pixel decode + plane md5)

Usage: python tools/scale_smoke_media.py [mults...]  (default 1 4 16)
One JSON line per (kind, mult); paste into docs/SCALING_RESULTS.md.
"""

from __future__ import annotations

import json
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.operators.multimodal import (  # noqa: E402
    extract_audio_features,
    extract_features,
    extract_video_features,
    image_fingerprints,
    sample_frames,
)
from datalakehouse_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
BASE_ASSETS = 2000  # per mult step


def _asset_frame(spark, mult: int):
    docs = (
        load_table(spark, BASE_SF, "documents")
        .where(F.length("text") >= 64)
        .select("doc_id", "text")
        .limit(BASE_ASSETS)
    )
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("asset_id"), "text"
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32)


def _gen_payloads(kind: str):
    """mapInPandas generator: text -> encoded media payload, executed
    on executors (driver never sees a payload)."""
    import pandas as pd

    def batches(it):
        from datalakehouse_spark.functions.avi import encode_avi, encode_avi_mjpeg
        from datalakehouse_spark.functions.bmp import encode_bmp, encode_bmp16
        from datalakehouse_spark.functions.flac import encode_flac, encode_flac_stub
        from datalakehouse_spark.functions.gif import (
            encode_gif, encode_gif_animation)
        from datalakehouse_spark.functions.ico import encode_ico
        from datalakehouse_spark.functions.pcx import encode_pcx
        from datalakehouse_spark.functions.pnm import encode_pnm
        from datalakehouse_spark.functions.qoi import encode_qoi
        from datalakehouse_spark.functions.tga import encode_tga
        from datalakehouse_spark.functions.jpeg import encode_jpeg
        from datalakehouse_spark.functions.mkv import encode_mkv_stub
        from datalakehouse_spark.functions.mp3 import encode_mp3_stub
        from datalakehouse_spark.functions.mp4 import encode_mp4_stub
        from datalakehouse_spark.functions.ogg import encode_ogg_stub
        from datalakehouse_spark.functions.tiff import encode_tiff
        from datalakehouse_spark.functions.png import encode_png
        from datalakehouse_spark.functions.wav import (
            encode_wav, encode_wav_adpcm, encode_wav_g711)

        grays = [(i, i, i) for i in range(256)]
        for pdf in it:
            ids, types, payloads = [], [], []
            for aid, text in zip(pdf["asset_id"], pdf["text"]):
                bts = text.encode("utf-8")[:64].ljust(64, b"x")
                if kind in ("image", "imagefp"):
                    m = aid % 11
                elif kind == "audio":
                    m = aid % 7
                else:
                    m = aid % 4
                if kind in ("image", "imagefp"):
                    if m == 0:
                        p = encode_png(16, 4, bts, color_type=0)
                    elif m == 1:
                        p = encode_jpeg(16, 8, (bts + bts)[:128])
                    elif m == 2:
                        p = encode_gif(16, 4, bts, grays)
                    elif m == 3:
                        p = encode_bmp(4, 4, (bts[:48]))
                    elif m == 4:  # round 13: alternate strip/tiled layout
                        p = encode_tiff(
                            16, 4, bts, tile_size=16 if aid % 2 else None
                        )
                    elif m == 5:  # round 13: 16-bit RGB565 BITFIELDS
                        p = encode_bmp16(
                            4, 4, bts[:48], 565 if aid % 2 else 555
                        )
                    elif m == 6:  # round 13: ICO favicon (PNG/DIB)
                        if aid % 2:
                            inner = encode_png(16, 4, bts, color_type=0)
                            p = encode_ico([(16, 4, inner, "png")])
                        else:
                            rgb3 = bytes(v for b in bts[:16] for v in (b, b, b))
                            p = encode_ico(
                                [(4, 4, encode_bmp(4, 4, rgb3), "bmp")]
                            )
                    elif m == 7:  # round 13: Netpbm (binary/ASCII alternating)
                        p = encode_pnm(
                            16, 4, list(bts), 5 if aid % 2 else 2
                        )
                    elif m == 8:  # round 13: TGA (RLE gray, bottom-up)
                        p = encode_tga(
                            16, 4, bts, "gray", rle=True, top_down=False
                        )
                    elif m == 9:  # round 13: QOI (run/index/diff/luma ops)
                        p = encode_qoi(
                            16, 4, bytes(v for b in bts for v in (b, b, b))
                        )
                    else:  # round 13: PCX (RLE scanlines, VGA palette)
                        p = encode_pcx(16, 4, bts, "gray")
                elif kind == "audio":
                    if m == 0:
                        p = encode_wav(
                            [(b - 128) / 256.0 for b in bts], sample_rate=8000
                        )
                    elif m == 1:
                        p = encode_mp3_stub(1 + bts[0] % 8, 32000, 128)
                    elif m == 2:
                        p = encode_ogg_stub((1 + bts[0]) * 256, 8000, 1)
                    elif m == 3:
                        p = encode_flac_stub((1 + bts[0]) * 100, 16000, 2)
                    elif m == 4:  # round 13: REAL FLAC PCM (rice + LPC)
                        p = encode_flac(
                            [[(b - 128) * 257 for b in bts]],
                            sample_rate=8000, block_size=16, lpc=bool(aid % 2),
                        )
                    elif m == 5:  # round 13: G.711 companded telephony
                        p = encode_wav_g711(
                            bts, "ulaw" if aid % 2 else "alaw"
                        )
                    else:  # round 13: IMA ADPCM (stateful 4-bit deltas)
                        p = encode_wav_adpcm(
                            bts[:32],
                            predictor=(bts[0] - 64) * 128,
                            step_index=bts[1] % 89,
                        )
                elif kind == "video":
                    if m == 0:
                        p = encode_avi([bts[:48]], 4, 4, fps=10)
                    elif m == 1:
                        p = encode_mp4_stub(64, 48, 1 + bts[0] % 30, fps=25.0)
                    elif m == 2:  # round 13: animated GIF as a video
                        p = encode_gif_animation(
                            8, 4,
                            [
                                dict(indices=bts[:32], disposal=1,
                                     delay_cs=10),
                                dict(indices=bts[32:40], left=2, top=1,
                                     width=4, height=2, disposal=2,
                                     transparent=bts[32], delay_cs=20),
                            ],
                            grays,
                        )
                    else:
                        p = encode_mkv_stub(64, 48, 1 + bts[0] % 30, fps=25.0)
                else:  # mjpeg: 2 frames of 2x2 constant blocks (16x16 px)
                    jpegs = []
                    for pix in (bts[:4], bts[4:8]):
                        plane = bytearray(16 * 16)
                        for i, v in enumerate(pix):
                            br, bc = divmod(i, 2)
                            for x in range(8):
                                off = (br * 8 + x) * 16 + bc * 8
                                plane[off : off + 8] = bytes([v]) * 8
                        jpegs.append(encode_jpeg(16, 16, bytes(plane)))
                    p = encode_avi_mjpeg(jpegs, 16, 16, fps=10, strip_dht=bool(m % 2))
                ids.append(aid)
                types.append(kind)
                payloads.append(p)
            yield pd.DataFrame(
                {"asset_id": ids, "media_type": types, "payload": payloads}
            )

    return batches


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark()
    passes = {
        "image": lambda df: extract_features(df, fake=False),
        "audio": extract_audio_features,
        "video": extract_video_features,
        "mjpeg": lambda df: sample_frames(df, stride=1, fake=False),
        "imagefp": image_fingerprints,
    }
    for kind, fn in passes.items():
        for mult in mults:
            assets = _asset_frame(spark, mult).mapInPandas(
                _gen_payloads(kind),
                "asset_id long, media_type string, payload binary",
            )
            t0 = time.perf_counter()
            out = fn(assets)
            n = out.count()
            if kind == "mjpeg":
                # n counts FRAME rows (2/asset); every asset must
                # contribute both frames or the decode silently dropped
                n_assets = out.select("asset_id").distinct().count()
                ok = n_assets if n == 2 * n_assets else 0
                n = n_assets
            else:
                ok = out.where(
                    F.col(
                        "width" if kind != "audio" else "sample_rate"
                    ).isNotNull()
                ).count()
            el = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "kind": kind,
                        "mult": mult,
                        "assets": n,
                        "decoded_ok": ok,
                        "sec": round(el, 2),
                        "assets_per_s": int(n / el),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
