import pytest

from flink_210225_spark.ops import multimodal


def test_decode_media_plumbing(spark):
    assets = multimodal.make_demo_assets(spark, 32)
    out = multimodal.decode_media(assets)
    rows = out.collect()
    assert len(rows) == 32
    assert all(len(r.feature) == multimodal.FEATURE_DIM for r in rows)
    assert all(-1.0 <= x <= 1.0 for r in rows for x in r.feature)
    # determinism: same payload -> same checksum/feature across runs
    again = {r.asset_id: (r.checksum, tuple(r.feature)) for r in multimodal.decode_media(assets).collect()}
    first = {r.asset_id: (r.checksum, tuple(r.feature)) for r in rows}
    assert first == again


def test_frame_sample_plan(spark):
    assets = multimodal.make_demo_assets(spark, 9)
    plan = multimodal.frame_sample_plan(assets, every_n=10)
    rows = plan.collect()
    assert all(r.frame_idx % 10 == 0 for r in rows)
    vids = {r.asset_id for r in rows}
    assert vids == {2, 5, 8}  # every third demo asset is a video


def test_rebalance_runs(spark):
    assets = multimodal.make_demo_assets(spark, 16)
    assert multimodal.rebalance_by_size(assets).count() == 16


def test_audio_segments_cover_payload(spark):
    """Segments tile [0, n_samples) exactly: contiguous, non-overlapping,
    last one clipped."""
    from flink_210225_spark.ops.multimodal import assets_from_documents, audio_segment_plan

    docs = spark.createDataFrame(
        [(1, "x" * 600), (4, "y" * 100), (7, "z")],  # doc_id % 3 == 1 -> audio
        "doc_id long, text string",
    )
    segs = audio_segment_plan(assets_from_documents(docs), 128).collect()
    by_asset = {}
    for r in segs:
        by_asset.setdefault(r.asset_id, []).append(r)
    # 600 bytes -> 300 samples -> segments 128+128+44
    s1 = sorted(by_asset[1], key=lambda r: r.seg_idx)
    assert [(r.start_sample, r.seg_samples) for r in s1] == [(0, 128), (128, 128), (256, 44)]
    # 100 bytes -> 50 samples -> one short segment
    assert [(r.start_sample, r.seg_samples) for r in by_asset[4]] == [(0, 50)]
    # 1 char -> 0 samples (floor(1/2)) -> no plan rows
    assert 7 not in by_asset


def test_tile_plan_covers_image(spark):
    """Tiles cover width×height exactly once (sum of areas == w*h)."""
    from flink_210225_spark.ops.multimodal import assets_from_documents, image_tile_plan

    docs = spark.createDataFrame(
        [(3, "a" * 50)], "doc_id long, text string"  # %3==0 -> image
    )
    tiles = image_tile_plan(assets_from_documents(docs)).collect()
    w = 50 % 96 + 32  # 82
    h = 50 * 7 % 64 + 32  # 62
    assert sum(r.tile_w * r.tile_h for r in tiles) == w * h
    assert len({(r.x0, r.y0) for r in tiles}) == len(tiles)
    assert max(r.x0 + r.tile_w for r in tiles) == w
    assert max(r.y0 + r.tile_h for r in tiles) == h


def test_multimodal_plans_match_oracle(tables):
    from flink_210225_spark.ops import multimodal as mm

    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    for name in (
        "multimodal_audio_segments",
        "multimodal_tile_plan",
        "multimodal_shard_layout",
    ):
        assert_matches_oracle(mm.QUERIES[name](tables), mm.ORACLES[name], SF_DIR)


def test_shard_layout_invariants(spark):
    """Next-fit byte packing: shards never exceed the budget unless a single
    oversized asset owns the shard; offsets are contiguous within a shard
    (offset = running fill); order within a kind is asset_id order."""
    from flink_210225_spark.ops import multimodal as mm
    from flink_210225_spark.ops.multimodal import shard_layout

    rows = []
    for i in range(12):
        size = 6000 if i == 5 else 1500 + (i % 3) * 700  # one oversized asset
        rows.append((i, "image", bytes(size), (1, 1, 0, 0, "x")))
    assets = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = sorted(shard_layout(assets, 4096).collect(), key=lambda r: r.asset_id)
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        total = sum(r.n_bytes for r in rs)
        assert total <= 4096 or len(rs) == 1, (shard, total)
        rs_sorted = sorted(rs, key=lambda r: r.byte_offset)
        fill = 0
        for r in rs_sorted:
            assert r.byte_offset == fill
            fill += r.n_bytes
    # oversized asset 5 sits alone
    alone = [r for r in out if r.asset_id == 5][0]
    assert len(by_shard[alone.shard]) == 1 and alone.byte_offset == 0


def test_caption_pairs_filter_discriminates(tables):
    """The pair filter must actually drop some captions (a keep-everything
    filter is a no-op) and keep decisions must follow the stated rule."""
    from flink_210225_spark.ops.multimodal import caption_pairs

    rows = caption_pairs(tables).collect()
    kept = sum(r.keep_pair for r in rows)
    assert 0 < kept < len(rows)
    for r in rows:
        assert r.keep_pair == (r.caption_tokens >= 5 and r.caption_quality >= 0.55)


def test_png_filter_round_trips():
    """The PNG encoder's None/Sub/Up filters and the decoder's generic
    reconstruction must round-trip byte-identical pixels."""
    import numpy as np

    from flink_210225_spark.ops import multimodal as mm

    for f in (0, 1, 2):
        dec = mm._parse_png(mm._png_bytes(7, 13, 9, filter_type=f))
        assert (dec["width"], dec["height"], dec["color_type"]) == (13, 9, 0)
        x = np.arange(13)
        y = np.arange(9)[:, None]
        want = ((7 * 7 + x * 3 + y * 11) % 256).astype(np.uint8)
        assert (dec["pixels"][:, :, 0] == want).all(), f


def test_png_average_and_paeth_filters_decode():
    """Hand-encode scanlines with the Average (3) and Paeth (4) filters —
    the decoder must reconstruct the same pixels the spec defines."""
    import struct
    import zlib

    import numpy as np

    from flink_210225_spark.ops import multimodal as mm

    rng = np.random.default_rng(42)
    w, h = 11, 6
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else b if pb <= pc else c

    rows = []
    for y in range(h):
        f = 3 if y % 2 == 0 else 4
        enc = []
        for x in range(w):
            left = int(px[y, x - 1]) if x > 0 else 0
            up = int(px[y - 1, x]) if y > 0 else 0
            ul = int(px[y - 1, x - 1]) if x > 0 and y > 0 else 0
            pred = (left + up) // 2 if f == 3 else paeth(left, up, ul)
            enc.append((int(px[y, x]) - pred) & 0xFF)
        rows.append(bytes([f]) + bytes(enc))
    raw = b"".join(rows)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    payload = (
        mm._PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    dec = mm._parse_png(payload)
    assert (dec["pixels"][:, :, 0] == px).all()


def test_wav_parse_real_container():
    """_wav_bytes writes a genuine RIFF/WAVE file and _parse_wav recovers
    rate, width, and the exact PCM samples."""
    import numpy as np

    from flink_210225_spark.ops import multimodal as mm

    dec = mm._parse_wav(mm._wav_bytes(3, 75))
    assert (dec["sample_rate"], dec["n_channels"], dec["n_frames"]) == (16000, 1, 75)
    k = np.arange(75)
    want = (((3 * 31 + k * 7) % 256) - 128) * 256
    assert (dec["samples"] == want).all()


def test_decode_media_dispatches_real_codecs(spark):
    """decode_media must route WAV/PNG payloads through the real parsers
    (feature == real-sample slice means), and arbitrary bytes through the
    sha256 stand-in."""
    import numpy as np

    from flink_210225_spark.ops import multimodal as mm

    wav = mm._wav_bytes(5, 120)
    png = mm._png_bytes(5, 10, 10)
    blob = b"\x00\x01\x02notacontainer"
    df = spark.createDataFrame(
        [
            (1, "audio", wav, (0, 0, 16000, 120, "audio/wav")),
            (2, "image", png, (10, 10, 0, 1, "image/png")),
            (3, "video", blob, (0, 0, 0, 0, "x-demo")),
        ],
        mm.MEDIA_SCHEMA,
    )
    got = {r.asset_id: r for r in mm.decode_media(df).collect()}
    k = np.arange(120)
    samples = (((5 * 31 + k * 7) % 256) - 128) * 256
    want_wav = mm._feature_from_samples(samples)
    assert np.allclose(got[1].feature, want_wav, atol=1e-6)
    pix = mm._parse_png(png)["pixels"].astype("int64") - 128
    assert np.allclose(got[2].feature, mm._feature_from_samples(pix), atol=1e-6)
    assert got[3].feature == pytest.approx(mm._decode_fake(blob))


def test_decode_media_corrupt_containers_fall_back(spark):
    """Payloads bearing RIFF/PNG magic but truncated or corrupt must fall
    through to the sha256 stand-in instead of crashing the task: wave.open
    raises wave.Error/EOFError and the PNG walk raises struct.error /
    zlib.error on such bytes (ADVICE r3 medium)."""
    from flink_210225_spark.ops import multimodal as mm

    wav, png = mm._wav_bytes(5, 120), mm._png_bytes(5, 10, 10)
    corrupt = [
        (1, wav[:20]),                      # truncated mid-header -> EOFError/wave.Error
        (2, wav[:12] + b"\xff" * 30),       # RIFF/WAVE magic, garbage chunks
        (3, png[:16]),                      # truncated after IHDR length -> struct.error
        (4, png[:33] + b"\x00\x00\x00\x08IDAT\xde\xad\xbe\xef" + png[-12:]),  # zlib.error
        (5, b"RIFF"),                       # not even long enough for magic check
    ]
    df = spark.createDataFrame(
        [(i, "audio", b, (0, 0, 0, 0, "x")) for i, b in corrupt], mm.MEDIA_SCHEMA
    )
    got = {r.asset_id: r for r in mm.decode_media(df).collect()}
    for i, b in corrupt:
        assert got[i].feature == pytest.approx(mm._decode_fake(b)), i


def test_wav_dft_audit_matches_oracle_and_contract(tables):
    """DFT anchors replayed by the oracle; contract booleans all TRUE; dc
    equals the plain sample sum by construction."""
    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    from flink_210225_spark.ops import multimodal as mm

    df = mm.wav_dft_audit(tables)
    assert_matches_oracle(df, mm.ORACLES["multimodal_wav_dft_audit"], SF_DIR)
    rows = df.collect()
    assert all(r.parseval_ok and r.symmetry_ok for r in rows)
    import numpy as np
    for r in rows[:10]:
        s = mm._parse_wav(mm._wav_bytes(int(r.asset_id), int(r.n_frames)))["samples"]
        assert int(s.sum()) == r.dc


def test_image_ahash_filter_invariance(tables):
    """Docs sharing a seed synthesize identical pixel content but encode
    with different scanline filters; the perceptual hash must collapse
    them into one group — the encoding-invariance contract of aHash."""
    from flink_210225_spark.ops import multimodal as mm

    rows = mm.image_ahash_groups(tables).collect()
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r.asset_id % 16, set()).add(r.ahash)
    assert all(len(hs) == 1 for hs in by_seed.values()), by_seed
    filters_per_seed = {}
    for r in rows:
        filters_per_seed.setdefault(r.asset_id % 16, set()).add(r.asset_id % 5)
    assert any(len(fs) >= 2 for fs in filters_per_seed.values())


def test_audio_vad_segments_cover_active_frames(tables):
    """Segments partition exactly the active frames: per clip, segment
    frame totals equal the count of frames whose energy beats the clip
    mean (strict integer threshold), and segments never touch."""
    import numpy as np

    from flink_210225_spark.ops import multimodal as mm

    segs = {}
    for r in mm.audio_vad_segments(tables).collect():
        segs.setdefault(r.asset_id, []).append((r.seg_start, r.seg_frames))
    docs = {r.doc_id: r.n_chars % 200 + 50 for r in tables["documents"].collect()}
    for doc_id, n in list(docs.items())[:25]:
        s = mm._parse_wav(mm._wav_bytes(doc_id, n))["samples"]
        nf = -(-len(s) // 25)
        e = np.array([int((s[f * 25 : (f + 1) * 25] ** 2).sum()) for f in range(nf)])
        active = e * nf > e.sum()
        got = sorted(segs.get(doc_id, []))
        assert sum(c for _s, c in got) == int(active.sum()), doc_id
        for (s1, c1), (s2, _c2) in zip(got, got[1:]):
            assert s1 + c1 < s2  # a gap separates islands


def test_video_cuts_partition_frames(tables):
    """Shots must partition each clip's frame range contiguously: starts
    ordered by shot id, each shot's span ends where the next begins, and
    the union covers all n_frames = doc_id % 12 + 8 frames."""
    from flink_210225_spark.ops import multimodal as mm

    shots = {}
    for r in mm.video_scene_cuts(tables).collect():
        shots.setdefault(r.asset_id, []).append((r.shot_id, r.start_frame, r.n_frames))
    assert shots
    for doc_id, ss in list(shots.items())[:50]:
        ss.sort()
        assert ss[0][1] == 0
        pos = 0
        for _sid, start, n in ss:
            assert start == pos
            pos += n
        assert pos == doc_id % 12 + 8
