#!/usr/bin/env python3
"""Value-check oracle for the multimodal rows that DuckDB cannot grade.

The synthetic media is deterministic math (seeded LCG pixel fields,
seeded sine PCM — MediaKernels.makePng/makeWav), and both PNG and WAV
round-trip losslessly, so this tool recomputes the DECODED content
per media_id straight from the generation spec — no JVM, no codecs —
and compares the Spark dumps value-for-value:

  mm_audio_features  rms of the seeded sine (exact IEEE replay)
  mm_audio_silence   injected-dropout silence runs (exact integers)
  mm_image_features  LCG channel means (independent of the DuckDB CTE)
  mm_video_features  per-frame grayscale means incl. float32 cast

Rounding replicates Spark's round() (BigDecimal HALF_UP on the double)
via decimal.Decimal — NOT Python's banker's round().

Usage:  python3 tools/media_oracle.py <verify_outdir>
"""
import sys, glob, math, struct
from decimal import Decimal, ROUND_HALF_UP
import pandas as pd

M = 1 << 64
A = 6364136223846793005
C = 1442695040888963407


def spark_round(x, n):
    """Spark round(col, n): BigDecimal.valueOf(double) HALF_UP. valueOf
    goes through Double.toString — the SHORTEST round-trip decimal, not
    the exact binary expansion — which decides exact ties like
    113/1600 = 0.070625 (stored as 0.0706249999...): Spark sees
    "0.070625" and rounds UP. Python's repr() is the same shortest
    representation."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), ROUND_HALF_UP))


def lcg_channel_sums(seed, w=24, h=16):
    """makePng's pixel field: state bytes 5/4/3 are r/g/b."""
    state = (seed * A + C) % M
    rs = gs = bs = 0
    for _ in range(w * h):
        state = (state * A + C) % M
        p = (state >> 24) & 0xFFFFFF
        rs += (p >> 16) & 0xFF
        gs += (p >> 8) & 0xFF
        bs += p & 0xFF
    return rs, gs, bs


def wav_samples(seed, sample_rate=8000, n_samples=1600):
    """makeWav's seeded sine, truncated toward zero to int16 like
    Scala's Double.toShort."""
    freq = 110.0 + (abs(seed) % 880)
    phase = (seed % 628) / 100.0
    w = 2 * math.pi * freq / sample_rate
    # int() truncates toward zero, matching (d).toShort for |d|<2^15
    return [int(math.sin(phase + w * i) * 12000) for i in range(n_samples)]


def rms(samples):
    # accumulate in the SAME left-to-right order as MediaKernels.rms
    acc = 0.0
    for v in samples:
        x = v / 32768.0
        acc += x * x
    return math.sqrt(acc / len(samples)) if samples else 0.0


def inject_dropout(samples, media_id):
    n = len(samples)
    ln = min(100 + (media_id % 200), n // 2)
    off = (media_id * 37) % max(n - ln, 1)
    out = list(samples)
    out[off:off + ln] = [0] * ln
    return out


def silence_stats(samples, threshold=512, min_run=64):
    n_runs = longest = silent = run = 0
    for i in range(len(samples) + 1):
        in_run = i < len(samples) and abs(samples[i]) < threshold
        if in_run:
            run += 1
        else:
            longest = max(longest, run)
            if run >= min_run:
                n_runs += 1
                silent += run
            run = 0
    return n_runs, longest, silent


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(p) for p in files]).sort_values(
        "media_id").reset_index(drop=True)


def check(name, df, expect_fn, cols):
    """expect_fn(media_id) -> dict of expected col values."""
    if df is None:
        print(f"{name:24s} NO DUMP — skipped")
        return 0
    bad = 0
    for _, row in df.iterrows():
        exp = expect_fn(int(row["media_id"]))
        for c in cols:
            got = row[c]
            if isinstance(exp[c], float):
                ok = got == exp[c]
            else:
                ok = int(got) == int(exp[c])
            if not ok:
                bad += 1
                print(f"   {name} media_id={row['media_id']} col={c}: "
                      f"spark={got!r} expected={exp[c]!r}")
    status = "OK" if bad == 0 else "FAIL"
    print(f"{name:24s} rows={len(df):4d} value-checked {status}")
    return bad


def main():
    outdir = sys.argv[1]
    fails = 0

    def audio_features(mid):
        s = wav_samples(mid)
        return {"sample_rate": 8000, "n_samples": 1600,
                "rms": spark_round(rms(s), 5)}

    fails += check("mm_audio_features", load(outdir, "mm_audio_features"),
                   audio_features, ["sample_rate", "n_samples", "rms"])

    def audio_silence(mid):
        s = inject_dropout(wav_samples(mid), mid)
        n_runs, longest, silent = silence_stats(s)
        return {"n_samples": 1600, "n_runs": n_runs, "longest_run": longest,
                "silent_frac": spark_round(silent / 1600.0, 5)}

    fails += check("mm_audio_silence", load(outdir, "mm_audio_silence"),
                   audio_silence,
                   ["n_samples", "n_runs", "longest_run", "silent_frac"])

    def image_features(mid):
        rs, gs, bs = lcg_channel_sums(mid)
        return {"width": 24, "height": 16,
                "mean_r": spark_round(rs / 384.0, 4),
                "mean_g": spark_round(gs / 384.0, 4),
                "mean_b": spark_round(bs / 384.0, 4)}

    fails += check("mm_image_features", load(outdir, "mm_image_features"),
                   image_features,
                   ["width", "height", "mean_r", "mean_g", "mean_b"])

    def video_features(mid):
        out = {"n_frames": 8, "width": 24, "height": 16}
        # frameSampleVideo k=4 over 8 frames samples indices 0,2,4,6;
        # the query projects elements 1 and 4 -> frames 0 and 6
        for col_name, fidx in (("f0", 0), ("f3", 6)):
            rs, gs, bs = lcg_channel_sums(mid * 31 + fidx)
            gray = (0.299 * (rs / 384.0) + 0.587 * (gs / 384.0)
                    + 0.114 * (bs / 384.0)) / 255.0
            # JVM double->float cast, then cast back for round()
            gray32 = struct.unpack("f", struct.pack("f", gray))[0]
            out[col_name] = spark_round(gray32, 4)
        return out

    fails += check("mm_video_features", load(outdir, "mm_video_features"),
                   video_features, ["n_frames", "width", "height", "f0", "f3"])

    print(f"\n{fails} value mismatches")
    sys.exit(1 if fails else 0)


main()
