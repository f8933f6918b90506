"""Multimodal binary-column plumbing: real header decoders, resize and
frame-sample batch shapes (the Spark-side mechanics are real; decoders
are deterministic fakes, SURVEY-brief stub policy)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sms_db_spark.operators.multimodal import (
    FRAME_SIZE,
    FRAME_STRIDE,
    decode_image,
    extract_features,
    fake_resize,
    resize_images,
    sample_frames,
    to_media_frame,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 40), (1, "xy"), (2, "b" * (FRAME_SIZE * FRAME_STRIDE + 1))],
        "doc_id long, text string",
    )
    return to_media_frame(docs)


def test_decode_image_real_headers():
    """decode_image is a REAL pure-python header parser: golden bytes for
    each supported container, hand-assembled per the format specs."""
    bmp = b"BM" + b"\x00" * 16 + (640).to_bytes(4, "little") + (480).to_bytes(4, "little")
    assert decode_image(bmp) == {"width": 640, "height": 480}
    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (320).to_bytes(4, "big") + (200).to_bytes(4, "big")
    )
    assert decode_image(png) == {"width": 320, "height": 200}
    gif = b"GIF89a" + (99).to_bytes(2, "little") + (77).to_bytes(2, "little")
    assert decode_image(gif) == {"width": 99, "height": 77}
    # JPEG: SOI, APP0 (skipped via its length), then SOF0 with dims
    app0 = b"\xff\xe0" + (4).to_bytes(2, "big") + b"JF"
    sof0 = b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08" + (600).to_bytes(2, "big") + (800).to_bytes(2, "big")
    assert decode_image(b"\xff\xd8" + app0 + sof0 + b"\x00" * 12) == {
        "width": 800, "height": 600,
    }
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02\x03 not an image")


def test_decode_audio_wav_header():
    from sms_db_spark.operators.multimodal import decode_audio

    wav = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + b"fmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little")          # channels
        + (44100).to_bytes(4, "little")      # sample rate
        + (176400).to_bytes(4, "little") + (4).to_bytes(2, "little")
        + (16).to_bytes(2, "little")         # bits/sample
    )
    assert decode_audio(wav) == {
        "channels": 2, "sample_rate": 44100, "bits_per_sample": 16,
    }
    with pytest.raises(ValueError):
        decode_audio(b"OggS")


def test_extract_features_shapes(spark):
    rows = {r["doc_id"]: r.asDict() for r in extract_features(_media(spark)).collect()}
    assert rows[0]["n_bytes"] == 40
    assert rows[0]["width"] == ord("a") and rows[0]["height"] == ord("a")
    assert len(rows[0]["payload_sha256"]) == 64


def test_resize_pads_and_truncates(spark):
    rows = {r["doc_id"]: r.asDict() for r in resize_images(_media(spark), 4, 3).collect()}
    assert all(len(r["payload"]) == 12 for r in rows.values())
    assert rows[0]["payload"] == b"a" * 12  # truncated
    assert rows[1]["payload"] == b"xy" + b"\x00" * 10  # zero-padded
    assert rows[1]["width"] == 4 and rows[1]["height"] == 3
    assert fake_resize(b"", 2, 2) == b"\x00" * 4


def test_sample_frames_one_to_many(spark):
    out = sample_frames(_media(spark)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 40 bytes -> 3 frames (16,16,8), stride 4 -> only frame 0
    assert [r["frame_idx"] for r in by_doc[0]] == [0]
    assert by_doc[0][0]["frame_text"] == "a" * FRAME_SIZE
    # doc 2: 65 bytes -> 5 frames, stride 4 -> frames 0 and 4
    idxs = sorted(r["frame_idx"] for r in by_doc[2])
    assert idxs == [0, 4]
    tail = [r for r in by_doc[2] if r["frame_idx"] == 4][0]
    assert tail["frame_text"] == "b"  # last partial frame, 1 byte


def test_media_frame_is_binary(spark):
    schema = {f.name: f.dataType.simpleString() for f in _media(spark).schema.fields}
    assert schema["payload"] == "binary"


def test_decode_image_jpeg_fill_bytes_and_standalone_markers():
    """Real-world JPEG quirks the segment walker must survive: 0xFF fill
    bytes between segments, standalone (length-less) markers (TEM,
    RST0-7), and EOI with no SOF."""
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (600).to_bytes(2, "big") + (800).to_bytes(2, "big")
    )
    # fill bytes before the SOF marker
    assert decode_image(b"\xff\xd8" + b"\xff\xff\xff" + sof0[1:] + b"\x00" * 12) == {
        "width": 800, "height": 600,
    }
    # standalone TEM and RST markers interleaved before SOF
    standalone = b"\xff\x01" + b"\xff\xd0" + b"\xff\xd7"
    assert decode_image(b"\xff\xd8" + standalone + sof0 + b"\x00" * 12) == {
        "width": 800, "height": 600,
    }
    # EOI before any SOF -> clean "no SOF" error, not a garbage length read
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8" + b"\xff\xd9")


def test_dhash_bands_bytes_bit_positions():
    """Golden bit-packing checks for the pure dHash kernel: the oracle
    recomputes this exact arithmetic in SQL, so the packing order
    (global bit t = row*8 + col, big-endian within each 16-bit band)
    must be pinned by value, not by round-trip."""
    from sms_db_spark.operators.multimodal import dhash_bands_bytes

    assert dhash_bands_bytes(bytes(72)) == (0, 0, 0, 0)  # flat: no gradients
    assert dhash_bands_bytes(bytes(range(72))) == (0xFFFF,) * 4  # ascending
    # one bright pixel at index 1: only bit t=0 (px[1] > px[0]) fires,
    # the band-0 MSB
    px = bytearray(72); px[1] = 1
    assert dhash_bands_bytes(bytes(px)) == (0x8000, 0, 0, 0)
    # one bright pixel at index 64 (row 7, col 1): fires only t=56
    # (px[64] > px[63]), band 3 bit k=8 -> weight 2^7
    px = bytearray(72); px[64] = 1
    assert dhash_bands_bytes(bytes(px)) == (0, 0, 0, 0x80)


def test_hamming_banded_pairs_band_meet_and_cap(spark):
    """Banded pair semantics: a Hamming-1 pair meets in its 3 equal
    bands and is emitted ONCE; a shared-band pair past the Hamming max
    is a candidate but rejected map-side; disjoint hashes never meet;
    and the q45 bucket cap drops an oversize bucket's pairs."""
    from sms_db_spark.operators.multimodal import hamming_banded_pairs

    hashed = spark.createDataFrame(
        [
            (0, 1, 2, 3, 4),
            (1, 1, 2, 3, 5),          # Hamming 1 vs doc 0 (band 3: 4^5)
            (2, 100, 200, 300, 400),  # no band shared with anyone
            (3, 1, 999, 998, 997),    # meets 0/1 in band 0, Hamming >> 3
        ],
        "doc_id long, b0 int, b1 int, b2 int, b3 int",
    )
    got = {(r.doc_a, r.doc_b) for r in hamming_banded_pairs(hashed).collect()}
    assert got == {(0, 1)}

    trip = spark.createDataFrame(
        [(i, 7, 7, 7, 7) for i in range(3)],
        "doc_id long, b0 int, b1 int, b2 int, b3 int",
    )
    assert hamming_banded_pairs(trip).count() == 3  # all 3 pairs, dedup'd
    assert hamming_banded_pairs(trip, max_bucket=2).count() == 0  # capped


def test_image_phash_matches_pure_kernel(spark):
    """The Arrow pass must agree with the pure-python kernel over the
    same fake-resized bytes (resize contract: truncate/zero-pad)."""
    from sms_db_spark.operators.multimodal import dhash_bands_bytes, image_phash

    docs = spark.createDataFrame(
        [(0, "The quick brown fox jumps over the lazy dog, twice over."),
         (1, "xy")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
            for r in image_phash(to_media_frame(docs)).collect()}
    for doc_id, text in [(0, "The quick brown fox jumps over the lazy dog, twice over."), (1, "xy")]:
        expect = dhash_bands_bytes(fake_resize(text.encode(), 9, 8))
        assert rows[doc_id] == expect, doc_id


def test_energy_bands_bytes_bit_positions():
    """Golden checks for the audio fingerprint kernel (same packing
    law as dHash: bit t = 16b + k at weight 2^(15-k))."""
    from sms_db_spark.operators.multimodal import (
        AUDIO_DATA_BYTES,
        energy_bands_bytes,
    )

    assert energy_bands_bytes(bytes(AUDIO_DATA_BYTES)) == (0, 0, 0, 0)
    # strictly rising energies: every gradient bit fires
    rising = b"".join(bytes([i] * 4) for i in range(65))
    assert energy_bands_bytes(rising) == (0xFFFF,) * 4
    # one loud frame 1 (samples 4..7): bit t=0 (e1 > e0) fires only
    px = bytearray(AUDIO_DATA_BYTES)
    px[4:8] = b"\x10\x10\x10\x10"
    assert energy_bands_bytes(bytes(px)) == (0x8000, 0, 0, 0)


def test_audio_frame_is_real_wav_and_fingerprint_matches_kernel(spark):
    """to_audio_frame emits REAL canonical WAV bytes (decode_audio — the
    actual parser — recovers the advertised layout) and the Arrow pass
    agrees with the pure kernel over the padded sample bytes."""
    from sms_db_spark.operators.multimodal import (
        AUDIO_DATA_BYTES,
        AUDIO_SAMPLE_RATE,
        audio_fingerprint,
        decode_audio,
        energy_bands_bytes,
        to_audio_frame,
    )

    texts = [(0, "Pack my box with five dozen liquor jugs." * 3), (1, "hi")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    media = to_audio_frame(docs)
    payloads = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for doc_id, text in texts:
        p = payloads[doc_id]
        assert decode_audio(p) == {
            "channels": 1,
            "sample_rate": AUDIO_SAMPLE_RATE,
            "bits_per_sample": 8,
        }
        raw = text.encode()[:AUDIO_DATA_BYTES]
        assert p[44:] == raw + b"\x00" * (AUDIO_DATA_BYTES - len(raw))
    rows = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
            for r in audio_fingerprint(media).collect()}
    for doc_id, _ in texts:
        assert rows[doc_id] == energy_bands_bytes(payloads[doc_id][44:]), doc_id


def test_audio_kernel_rejects_truncated_containers():
    """A truncated WAV (intact 44-byte header region, missing samples)
    must RAISE, not fingerprint as silence — the silent-silence path
    would emit false near-dup pairs with genuinely short documents
    (review r13)."""
    from sms_db_spark.operators.multimodal import (
        AUDIO_DATA_BYTES,
        _audio_kernel,
        _wav_header,
    )

    full = _wav_header(AUDIO_DATA_BYTES) + b"x" * AUDIO_DATA_BYTES
    assert len(_audio_kernel(full)) == 4  # intact container fingerprints
    with pytest.raises(ValueError, match="truncated or non-canonical"):
        _audio_kernel(full[:100])  # header survives, samples gone
    with pytest.raises(ValueError, match="truncated or non-canonical"):
        _audio_kernel(full[:-1])  # one byte short
    # a declared data size that isn't the lane's fixed grid is refused
    odd = _wav_header(AUDIO_DATA_BYTES - 4) + b"x" * (AUDIO_DATA_BYTES - 4)
    with pytest.raises(ValueError, match="truncated or non-canonical"):
        _audio_kernel(odd)


def test_video_frame_neardup_vote_law(spark):
    """Doc-level vote semantics over hand-built frames: identical
    frames across two docs count per-frame-pair; same-doc frame pairs
    are dropped; a single matching frame misses the >=2 vote; the fid
    packing round-trips doc ids exactly. dHash is GRADIENT-based
    (value-blind), so the frame patterns must differ in gradient SIGNS
    — asserted via the pure kernel before the Spark law is tested."""
    from sms_db_spark.operators.multimodal import (
        DHASH_H,
        DHASH_W,
        dhash_bands_bytes,
        fake_resize,
        video_frame_neardup,
    )

    fa = "ABCDEFGHIJKLMNOP"  # ascending gradients
    fb = "AZAZAZAZAZAZAZAZ"  # alternating gradients
    fz = "ZAZAZAZAZAZAZAZA"  # opposite-phase alternating
    fc = "PONMLKJIHGFEDCBA"  # descending gradients
    fp = {
        s: dhash_bands_bytes(fake_resize(s.encode(), DHASH_W, DHASH_H))
        for s in (fa, fb, fz, fc)
    }

    def hd(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x, y))

    # distinct patterns must be beyond the Hamming<=3 pair threshold,
    # or the vote expectations below would be testing the wrong law
    for x, y in (
        (fa, fb), (fa, fz), (fa, fc), (fb, fz), (fb, fc), (fz, fc)
    ):
        assert hd(fp[x], fp[y]) > 3, (x, y)

    # docs 7 and 9 share 3 matching frame pairs (two fa-fa cross pairs
    # since doc 9 carries fa twice, plus fb-fb); doc 11 shares only
    # doc 7's fc frame (ONE pair — misses the >=2 vote); doc 13 is
    # disjoint. Within doc 9, frames 0 and 8 are identical — the
    # same-doc pair must not surface.
    frames = spark.createDataFrame(
        [
            (7, 0, fa), (7, 4, fb), (7, 8, fc),
            (9, 0, fa), (9, 4, fb), (9, 8, fa),
            (11, 0, fc),
            (13, 0, fz),
        ],
        "doc_id long, frame_idx long, frame_text string",
    )
    got = {
        (r.doc_a, r.doc_b, r.n_frame_matches)
        for r in video_frame_neardup(frames).collect()
    }
    assert got == {(7, 9, 3)}
    # with the vote floor at 1, the single-frame matches surface too
    got1 = {
        (r.doc_a, r.doc_b)
        for r in video_frame_neardup(frames, min_frames=1).collect()
    }
    assert got1 == {(7, 9), (7, 11)}  # no diagonal, no 9-11, no 13
    assert all(a < b for a, b in got1)  # canonical orientation


def test_video_neardup_hamming_tolerance_engages(spark):
    """Two docs whose frames differ by ONE gradient bit must pair —
    the review-r14 scenario: at q56's 16-byte demo frame size, bands
    1-3 were identically zero for every frame (universal cap-dropped
    attractor buckets), so only EXACT band-0 matches ever paired and
    the advertised Hamming<=3 tolerance never engaged. At the video
    lane's full-grid VIDEO_FRAME_SIZE, a near-identical frame agrees
    on >=1 informative band (pigeonhole) and the vote fires."""
    from sms_db_spark.operators.multimodal import (
        DHASH_H,
        DHASH_W,
        VIDEO_FRAME_SIZE,
        dhash_bands_bytes,
        fake_resize,
        video_frame_neardup,
    )

    assert VIDEO_FRAME_SIZE == DHASH_W * DHASH_H  # the geometry law
    fa = "".join(chr(65 + (i % 26)) for i in range(VIDEO_FRAME_SIZE))
    # one mid-frame adjacent swap: a near-dup frame, NOT an exact one
    fb = fa[:40] + fa[41] + fa[40] + fa[42:]
    fother = fa[::-1]
    ha, hb = (
        dhash_bands_bytes(fake_resize(s.encode(), DHASH_W, DHASH_H))
        for s in (fa, fb)
    )
    hd = sum(bin(x ^ y).count("1") for x, y in zip(ha, hb))
    assert 1 <= hd <= 3 and ha != hb  # genuinely near, genuinely not exact

    frames = spark.createDataFrame(
        [
            (1, 0, fa), (1, 1, fother),
            (2, 0, fb), (2, 1, fother),
        ],
        "doc_id long, frame_idx long, frame_text string",
    )
    got = {
        (r.doc_a, r.doc_b, r.n_frame_matches)
        for r in video_frame_neardup(frames).collect()
    }
    # fa~fb (Hamming<=3) plus the exact fother pair -> 2 votes
    assert got == {(1, 2, 2)}


def test_batch_kernels_match_row_kernels():
    """The r17 vectorized batch kernels are bit-identical to the
    per-payload reference kernels over representative payloads
    (short/empty/oversized for dHash; canonical WAVs for audio) — the
    vectorization must never move a single fingerprint bit."""
    import numpy as np

    from sms_db_spark.operators.multimodal import (
        AUDIO_DATA_BYTES,
        DHASH_H,
        DHASH_W,
        _audio_bands_batch,
        _audio_kernel,
        _dhash_bands_batch,
        _wav_header,
        dhash_bands_bytes,
        fake_resize,
    )

    payloads = [
        b"",  # all-pad
        b"a",  # one byte
        bytes(range(DHASH_W * DHASH_H)),  # exact grid
        (b"xyz" * 100),  # oversized -> truncate
        b"The quick brown fox jumps over the lazy dog 0123456789!!",
    ]
    want = np.asarray(
        [dhash_bands_bytes(fake_resize(p, DHASH_W, DHASH_H)) for p in payloads],
        dtype=np.int32,
    )
    got = _dhash_bands_batch(payloads)
    assert (got == want).all()

    wavs = [
        _wav_header(AUDIO_DATA_BYTES)
        + bytes((i * 7 + j * 13) % 251 for j in range(AUDIO_DATA_BYTES))
        for i in range(4)
    ]
    want_a = np.asarray([_audio_kernel(p) for p in wavs], dtype=np.int32)
    got_a = _audio_bands_batch(wavs)
    assert (got_a == want_a).all()

    # a malformed payload still fails loud through the batch path
    import pytest

    with pytest.raises(ValueError):
        _audio_bands_batch(wavs + [b"RIFFgarbage"])
