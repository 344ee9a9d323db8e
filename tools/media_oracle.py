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
  mm_image_phash     full numpy DCT pHash replay -> expected pair set
  mm_image_neardup   thumbnail-cosine replay (exact IEEE sum order)
  mm_video_scenecut  grid-diff replay over the shot-video frames
  text_compression_ratio  zlib level-6 deflate sizes (verified byte-
                     identical between java.util.zip and CPython zlib)

The pHash / near-dup / scene-cut replays are possible because
MediaKernels.grayGrid resamples with PURE bilinear arithmetic (not
Java2D drawImage) and phash63 quantizes its DCT cos table to a 1e-9
grid — both engines then feed identical doubles through identical
summation orders.

Rounding replicates Spark's round() (BigDecimal HALF_UP on the double)
via decimal.Decimal — NOT Python's banker's round().

Usage:  python3 tools/media_oracle.py <verify_outdir> [sfdir]
        (sfdir defaults to /root/testdata/sf0.01 — needed by the
        replays whose id universe / text comes from the sf tables)
"""
import sys, glob, math, struct, zlib
from decimal import Decimal, ROUND_HALF_UP
import numpy as np
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


def lcg_pixels(seed, w=24, h=16):
    """makePng's full pixel field, row-major (y outer, x inner)."""
    state = (seed * A + C) % M
    px = []
    for _ in range(w * h):
        state = (state * A + C) % M
        px.append((state >> 24) & 0xFFFFFF)
    return px


def inject_variant(px, mid, w=24, h=16):
    """injectImageVariants: 3 seeded pixels XOR 0x101010."""
    out = list(px)
    for i in range(3):
        x = (mid * 31 + i * 17) % w
        y = (mid * 13 + i * 7) % h
        out[y * w + x] ^= 0x101010
    return out


def gray_grid(px, w, h, k):
    """MediaKernels.grayGrid: pure bilinear, pixel-center aligned,
    edge-clamped; returns k*k float32 values (as python floats)."""
    out = []
    for y in range(k):
        sy = (y + 0.5) * h / k - 0.5
        sy = 0.0 if sy < 0 else (float(h - 1) if sy > h - 1 else sy)
        y0 = int(sy)
        y1 = y0 + 1 if y0 + 1 < h else y0
        fy = sy - y0
        for x in range(k):
            sx = (x + 0.5) * w / k - 0.5
            sx = 0.0 if sx < 0 else (float(w - 1) if sx > w - 1 else sx)
            x0 = int(sx)
            x1 = x0 + 1 if x0 + 1 < w else x0
            fx = sx - x0
            p00, p01 = px[y0 * w + x0], px[y0 * w + x1]
            p10, p11 = px[y1 * w + x0], px[y1 * w + x1]

            def ch(sh):
                a = (((p00 >> sh) & 0xff) * (1.0 - fx)
                     + ((p01 >> sh) & 0xff) * fx)
                b = (((p10 >> sh) & 0xff) * (1.0 - fx)
                     + ((p11 >> sh) & 0xff) * fx)
                return a * (1.0 - fy) + b * fy

            gray = 0.299 * ch(16) + 0.587 * ch(8) + 0.114 * ch(0)
            out.append(float(np.float32(gray / 255.0)))
        # (row-major append order matches out(y*k+x))
    return out


_COS_TAB = None


def phash63(g):
    """MediaKernels.phash63 on a 1024-float grid: separable DCT with
    the 1e-9-quantized cos table, 63 non-DC coeffs, median bits."""
    global _COS_TAB
    n = 32
    if _COS_TAB is None:
        # math.rint = round-half-even; Python round() on a float too
        _COS_TAB = [[round(math.cos(math.pi * (2 * x + 1) * u / (2.0 * n))
                           * 1e9) / 1e9
                     for x in range(n)] for u in range(8)]
    rows = [[0.0] * 8 for _ in range(n)]
    for y in range(n):
        for u in range(8):
            s = 0.0
            for x in range(n):
                s += g[y * n + x] * _COS_TAB[u][x]
            rows[y][u] = s
    coeffs = []
    for v in range(8):
        for u in range(8):
            if v != 0 or u != 0:
                s = 0.0
                for yy in range(n):
                    s += rows[yy][u] * _COS_TAB[v][yy]
                coeffs.append(s)
    med = sorted(coeffs)[31]
    h = 0
    for i, c in enumerate(coeffs):
        if c > med:
            h |= 1 << i
    return h


def goertzel_freq(samples, sample_rate=8000, flo=110, fhi=989):
    """MediaKernels.dominantFreq: quantized-coefficient Goertzel scan,
    vectorized over the candidate grid; identical per-(f, n) op order
    as the JVM loop, first-max tie-break = lowest frequency."""
    f = np.arange(flo, fhi + 1, dtype=np.float64)
    c = np.rint(2.0 * np.cos(2.0 * np.pi * f / sample_rate) * 1e9) / 1e9
    s1 = np.zeros_like(c)
    s2 = np.zeros_like(c)
    for v in samples:
        s = v + c * s1 - s2
        s2 = s1
        s1 = s
    p = s1 * s1 + s2 * s2 - c * s1 * s2
    return flo + int(np.argmax(p))


def dhash63(g9):
    """MediaKernels.dhash63 on a 9x9 grid: horizontal neighbor
    comparisons over the first 8 rows, 63 bits."""
    h = 0
    i = 0
    for y in range(8):
        for x in range(8):
            if i >= 63:
                break
            if g9[y * 9 + x + 1] > g9[y * 9 + x]:
                h |= 1 << i
            i += 1
    return h


def cosine_sim(a, b):
    """VectorFunctions.CosineSimilarity: left-to-right accumulation,
    sqrt(na)*sqrt(nb) denominator."""
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    den = math.sqrt(na) * math.sqrt(nb)
    return None if den == 0.0 else dot / den


def compare_frames(name, got, exp, float_cols=()):
    """Exact frame compare after sorting both sides by all key cols."""
    if got is None:
        print(f"{name:24s} NO DUMP — skipped")
        return 0
    if exp.empty and got.empty:
        print(f"{name:24s} rows=   0 value-checked OK (both empty)")
        return 0
    keys = [c for c in exp.columns]
    got = got[keys].sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"{name:24s} ROW COUNT spark={len(got)} expected={len(exp)} FAIL")
        return 1
    bad = 0
    for c in keys:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            ok = (g == e) if c in float_cols else (int(g) == int(e))
            if not ok:
                bad += 1
                if bad <= 5:
                    print(f"   {name} row {i} col={c}: spark={g!r} expected={e!r}")
    status = "OK" if bad == 0 else "FAIL"
    print(f"{name:24s} rows={len(got):4d} value-checked {status}")
    return bad


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(p) for p in files]).sort_values(
        "media_id").reset_index(drop=True)


def load_raw(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(p) for p in files]).reset_index(
        drop=True)


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
            if exp[c] is None:
                # Spark NULL round-trips through parquet/pandas as
                # None or NaN depending on dtype — both mean "null"
                ok = got is None or (isinstance(got, float) and
                                     math.isnan(got))
            elif isinstance(exp[c], float):
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

    def audio_pitch(mid):
        return {"sample_rate": 8000, "n_samples": 1600,
                "freq_hz": goertzel_freq(wav_samples(mid))}

    fails += check("mm_audio_pitch", load(outdir, "mm_audio_pitch"),
                   audio_pitch, ["sample_rate", "n_samples", "freq_hz"])

    def audio_snr(mid):
        clean = wav_samples(mid)
        noisy = inject_dropout(clean, mid)
        es = sum(v * v for v in clean)
        en = sum((c - n) * (c - n) for c, n in zip(clean, noisy))
        # mirror the Scala guard: a dropout that alters nothing gives
        # e_noise == 0 and the Spark side publishes snr_db = NULL
        snr = (None if en == 0
               else spark_round(10.0 * math.log10(es / en), 4))
        return {"e_signal": es, "e_noise": en, "snr_db": snr}

    fails += check("mm_audio_snr", load(outdir, "mm_audio_snr"),
                   audio_snr, ["e_signal", "e_noise", "snr_db"])

    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")
    ids200 = sorted(int(i) for i in docs["doc_id"].unique() if i < 200)
    ids100 = [i for i in ids200 if i < 100]

    # ---- mm_image_phash: full DCT replay; banding is pigeonhole-
    # complete at Hamming<=7, so expected == brute-force pair set
    hashes = {}
    for mid in ids200:
        px = lcg_pixels(mid)
        hashes[mid] = phash63(gray_grid(px, 24, 16, 32))
        if mid % 4 == 0:
            hashes[mid + 1000000] = phash63(
                gray_grid(inject_variant(px, mid), 24, 16, 32))
    idlist = sorted(hashes)
    prs = []
    for i in range(len(idlist)):
        for j in range(i + 1, len(idlist)):
            hd = bin(hashes[idlist[i]] ^ hashes[idlist[j]]).count("1")
            if hd <= 7:
                prs.append((idlist[i], idlist[j], hd))
    fails += compare_frames(
        "mm_image_phash", load_raw(outdir, "mm_image_phash"),
        pd.DataFrame(prs, columns=["id_a", "id_b", "hamming"]))

    # ---- mm_image_dhash: gradient-hash twin of the pHash pairs
    dh = {}
    for mid in ids200:
        px = lcg_pixels(mid)
        dh[mid] = dhash63(gray_grid(px, 24, 16, 9))
        if mid % 4 == 0:
            dh[mid + 1000000] = dhash63(
                gray_grid(inject_variant(px, mid), 24, 16, 9))
    dlist = sorted(dh)
    dprs = []
    for i in range(len(dlist)):
        for j in range(i + 1, len(dlist)):
            hd = bin(dh[dlist[i]] ^ dh[dlist[j]]).count("1")
            if hd <= 7:
                dprs.append((dlist[i], dlist[j], hd))
    fails += compare_frames(
        "mm_image_dhash", load_raw(outdir, "mm_image_dhash"),
        pd.DataFrame(dprs, columns=["id_a", "id_b", "hamming"]))

    # ---- mm_image_neardup: 4x4 thumbnail cosine (raw-sim threshold,
    # then Spark-rounded to 5dp like the QueryDef)
    thumbs = {mid: gray_grid(lcg_pixels(mid), 24, 16, 4) for mid in ids200}
    nd = []
    for i in range(len(ids200)):
        for j in range(i + 1, len(ids200)):
            sim = cosine_sim(thumbs[ids200[i]], thumbs[ids200[j]])
            if sim is not None and sim >= 0.99:
                nd.append((ids200[i], ids200[j], spark_round(sim, 5)))
    fails += compare_frames(
        "mm_image_neardup", load_raw(outdir, "mm_image_neardup"),
        pd.DataFrame(nd, columns=["id_a", "id_b", "sim"]),
        float_cols={"sim"})

    # ---- mm_video_scenecut: shot videos (12 frames, shotLen=2+id%3),
    # float32 grid-diff accumulated left-to-right in double
    sc = []
    for mid in ids100:
        shot_len = 2 + mid % 3
        grids = [np.array(gray_grid(lcg_pixels(mid * 131 + f // shot_len),
                                    24, 16, 4), dtype=np.float32)
                 for f in range(12)]
        cuts = []
        for f in range(1, 12):
            diff = np.abs(grids[f] - grids[f - 1])
            acc = 0.0
            for v in diff:
                acc += float(v)
            if acc / 16 > 0.02:
                cuts.append(f)
        sc.append((mid, 12, len(cuts), cuts[0] if cuts else -1))
    fails += compare_frames(
        "mm_video_scenecut", load_raw(outdir, "mm_video_scenecut"),
        pd.DataFrame(sc, columns=["media_id", "n_frames", "n_cuts",
                                  "first_cut"]))

    # ---- text_compression_ratio: CPython zlib level 6 == JDK Deflater
    # level 6 (verified byte-identical on this container)
    cr = []
    for _, r in docs.iterrows():
        raw = str(r["text"]).encode("utf-8")
        ratio = (len(zlib.compress(raw, 6)) / len(raw)) if raw else 1.0
        cr.append((int(r["doc_id"]), spark_round(ratio, 6)))
    fails += compare_frames(
        "text_compression_ratio", load_raw(outdir, "text_compression_ratio"),
        pd.DataFrame(cr, columns=["doc_id", "deflate_ratio"]),
        float_cols={"deflate_ratio"})

    print(f"\n{fails} value mismatches")
    sys.exit(1 if fails else 0)


main()
