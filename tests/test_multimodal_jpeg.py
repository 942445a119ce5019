"""Baseline JFIF codec tests (VERDICT r14 "What's missing #1"): the
encode → marker-walk → Huffman → dequant → integer-IDCT round trip, the
corrupt-stream rejection matrix, the oracle's literal-basis pin, and the
near-dup family geometry the dedup entry relies on."""

from __future__ import annotations

import numpy as np
import pytest

from spanner_jdbc_converter_spark.operators import multimodal as mm


def _expected_planes(doc_id: int):
    """Formula replay: coefficients -> dequant -> integer IDCT, the
    exact computation the DuckDB oracle runs."""
    w, h = mm._jpeg_dims(doc_id)
    S = np.asarray(mm._JPEG_IDCT_S, dtype=np.int64)
    M = np.einsum("ux,vy->vuyx", S, S).reshape(64, 64)
    planes = []
    for comp in range(3):
        q = mm._JPEG_QT_LUMA if comp == 0 else mm._JPEG_QT_CHROMA
        plane = np.zeros((h, w), dtype=np.uint8)
        for by in range(h // 8):
            for bx in range(w // 8):
                zz = mm._jpeg_block_coefs(doc_id, comp, bx, by)
                coef = np.zeros(64, dtype=np.int64)
                for kk in range(64):
                    coef[mm._JPEG_ZIGZAG[kk]] = zz[kk] * q[kk]
                px = 128 + ((coef @ M) + (1 << 23) >> 24)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    np.clip(px, 0, 255).astype(np.uint8).reshape(8, 8)
                )
        planes.append(plane)
    return w, h, planes


def test_jpeg_round_trip_matches_formula_replay():
    """Decoded pixels must equal the coefficient-formula + integer-IDCT
    replay bit-for-bit for every component — entropy coding is lossless
    by construction, so ANY divergence is a codec bug."""
    for doc_id in (0, 1, 2, 3, 7, 12, 23, 40, 97):
        payload = mm._jpeg_bytes(doc_id)
        w, h, planes = mm._jpeg_decode(payload)
        ew, eh, eplanes = _expected_planes(doc_id)
        assert (w, h) == (ew, eh)
        for c in range(3):
            assert np.array_equal(planes[c], eplanes[c]), (doc_id, c)


def test_jpeg_stream_is_structurally_real():
    """The payload is a genuine JFIF stream other decoders would accept
    structurally: SOI/APP0-JFIF/DQT/SOF0/DHT/SOS markers in order, EOI
    terminated, and 0xFF bytes inside the scan always stuffed (doc 5 —
    no restart interval) or stuffed-or-RSTn (doc 0 — DRI stream with
    byte-aligned sequence-numbered restart markers)."""
    data = mm._jpeg_bytes(5)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    assert b"\xff\xdd" not in data  # doc 5: no restart interval
    # every 0xFF in the entropy region is followed by 0x00 (stuffed)
    sos = data.index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big")
    scan = data[scan_start:-2]
    for i, b in enumerate(scan[:-1]):
        if b == 0xFF:
            assert scan[i + 1] == 0x00, f"unstuffed 0xFF at scan byte {i}"

    # DRI stream: markers present, in sequence, everything else stuffed
    data = mm._jpeg_bytes(0)
    assert b"\xff\xdd" in data
    sos = data.index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big")
    scan = data[scan_start:-2]
    rsts = []
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF:
            nxt = scan[i + 1]
            if 0xD0 <= nxt <= 0xD7:
                rsts.append(nxt - 0xD0)
                i += 2
                continue
            assert nxt == 0x00, f"unstuffed 0xFF at scan byte {i}"
            i += 2
            continue
        i += 1
    assert rsts == [k % 8 for k in range(len(rsts))] and rsts


def test_jpeg_oracle_basis_rows_pin():
    """The literal IDCT basis rows embedded in the oracle SQL must match
    the decoder's table — a drift here silently decouples the engines."""
    from spanner_jdbc_converter_spark.plans import extensions as ext

    assert all(v == ext._J_S0 for v in mm._JPEG_IDCT_S[0])
    assert mm._JPEG_IDCT_S[1] == ext._J_S1
    assert mm._JPEG_IDCT_S[2] == ext._J_S2
    # and the quant formulas at the six live zigzag slots
    assert [mm._JPEG_QT_LUMA[k] for k in range(6)] == [8, 10, 12, 14, 16, 8]
    assert [mm._JPEG_QT_CHROMA[k] for k in range(6)] == [12, 16, 20, 12, 16, 20]


def test_jpeg_dims_support_dhash_grid():
    """Every family's dims are block-aligned and large enough for the
    9×7 dHash grid on the half-size thumbnail (w≥18, h≥14)."""
    for doc_id in range(64):
        w, h = mm._jpeg_dims(doc_id)
        assert w % 8 == 0 and h % 8 == 0
        assert w >= 18 and h >= 14


def test_jpeg_family_near_dup_geometry():
    """Members of a //4 family hash within the ≤3-bit pairing threshold
    of at least one sibling (the ±1 AC wobble is a few grey levels);
    cross-family hashes are far — the structure dedup_jpeg_image_pairs
    banks on."""

    def dh(doc_id: int) -> int:
        w, h, planes = mm._jpeg_decode(mm._jpeg_bytes(doc_id))
        return mm._dhash56(w, h, planes[0].tobytes())

    for fam in range(3):
        hs = [dh(fam * 4 + m) for m in range(4)]
        intra = [
            bin(hs[i] ^ hs[j]).count("1")
            for i in range(4)
            for j in range(i + 1, 4)
        ]
        assert max(intra) <= 8 and min(intra) <= 3, (fam, intra)
    assert bin(dh(0) ^ dh(4)).count("1") > 10
    assert bin(dh(1) ^ dh(9)).count("1") > 10


def _corrupt(data: bytes, **kw) -> bytes:
    b = bytearray(data)
    for pos, val in kw.items():
        b[int(pos[1:])] = val
    return bytes(b)


def test_jpeg_corrupt_stream_rejection_matrix():
    """Every stream this decoder cannot FAITHFULLY decode must raise
    ValueError — never return garbage pixels silently."""
    good = mm._jpeg_bytes(3)

    # not a JPEG at all / clobbered SOI
    with pytest.raises(ValueError, match="SOI"):
        mm._jpeg_decode(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="SOI"):
        mm._jpeg_decode(_corrupt(good, _0=0x00))

    # truncated: mid-segment and mid-entropy-scan
    with pytest.raises(ValueError):
        mm._jpeg_decode(good[:20])
    with pytest.raises(ValueError):
        mm._jpeg_decode(good[: len(good) // 2])  # no EOI / truncated scan

    # SOF2 now DISPATCHES to the progressive decoder (r16) — a baseline
    # stream with its SOF marker flipped is a MALFORMED progressive
    # stream: the baseline Ss=0/Se=63 scan header is invalid in
    # progressive — still ValueError, never garbage pixels
    sof = good.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="spectral selection"):
        mm._jpeg_decode(_corrupt(good, **{f"_{sof + 1}": 0xC2}))
    nodri = mm._jpeg_bytes(3, restart_interval=0)
    sof_n = nodri.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="spectral selection"):
        mm._jpeg_decode(_corrupt(nodri, **{f"_{sof_n + 1}": 0xC2}))
    # other non-baseline SOFs still reject by name
    with pytest.raises(ValueError, match="non-baseline"):
        mm._jpeg_decode(_corrupt(good, **{f"_{sof + 1}": 0xC1}))

    # 16-bit quant table (DQT precision nibble)
    dqt = good.index(b"\xff\xdb")
    with pytest.raises(ValueError, match="16-bit"):
        mm._jpeg_decode(_corrupt(good, **{f"_{dqt + 4}": 0x10}))

    # unsupported sampling layout (3x3 luma is neither 4:4:4 nor 4:2:0)
    with pytest.raises(ValueError, match="sampling factors"):
        mm._jpeg_decode(_corrupt(good, **{f"_{sof + 11}": 0x33}))

    # restart interval claimed but no RST markers present: inject a
    # DRI(1) segment into a non-restart stream — the decoder must
    # demand the marker at MCU 1 and refuse the bare entropy bytes
    sos = good.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x01"
    with pytest.raises(ValueError, match="expected JPEG restart"):
        mm._jpeg_decode(good[:sos] + dri + good[sos:])

    # malformed DRI body (wrong length)
    with pytest.raises(ValueError, match="malformed JPEG DRI"):
        mm._jpeg_decode(good[:sos] + b"\xff\xdd\x00\x03\x00" + good[sos:])

    # out-of-sequence restart marker: doc 0 carries DRI/RST markers —
    # corrupt the first RST0 into RST5
    rst_stream = mm._jpeg_bytes(0)
    first_rst = rst_stream.index(b"\xff\xd0")
    broken = bytearray(rst_stream)
    broken[first_rst + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence"):
        mm._jpeg_decode(bytes(broken))

    # unstuffed marker inside the entropy stream
    scan_start = sos + 2 + int.from_bytes(good[sos + 2 : sos + 4], "big")
    bad = bytearray(good)
    bad[scan_start + 4 : scan_start + 6] = b"\xff\xd5"
    with pytest.raises(ValueError):
        mm._jpeg_decode(bytes(bad))

    # SOS naming an unknown component id
    with pytest.raises(ValueError, match="unknown component"):
        mm._jpeg_decode(_corrupt(good, **{f"_{sos + 5}": 0x09}))

    # corrupt segment bodies whose DECLARED seglen is intact but whose
    # contents are inconsistent must still raise ValueError, never leak
    # IndexError/struct.error past the documented contract (ADVICE r15):
    # SOS ns claiming more scan components than the body holds
    with pytest.raises(ValueError, match="truncated SOS component list"):
        mm._jpeg_decode(_corrupt(good, **{f"_{sos + 4}": 0x09}))
    # SOF component count nc pointing past the body
    with pytest.raises(ValueError, match="truncated SOF component list"):
        mm._jpeg_decode(_corrupt(good, **{f"_{sof + 9}": 0x09}))
    # SOF body shorter than its fixed 6-byte head: shrink seglen to 7
    # (5-byte body) and splice out the dropped tail so the walk stays
    # aligned on the next marker
    short_sof = good[:sof + 2] + b"\x00\x07" + good[sof + 4 : sof + 9] + good[sof + 2 + int.from_bytes(good[sof + 2 : sof + 4], "big") :]
    with pytest.raises(ValueError, match="truncated SOF body"):
        mm._jpeg_decode(short_sof)

    # and the good stream still decodes after all that
    w, h, planes = mm._jpeg_decode(good)
    assert (w, h) == mm._jpeg_dims(3) and len(planes) == 3


def test_jpeg_spark_entries_empty_and_schema(spark):
    """decode_jpeg_features / decode_jpeg_dhash honor the schema contract
    on empty input and produce formula-consistent rows on a tiny frame."""
    sch = "doc_id long"
    empty = spark.createDataFrame([], sch)
    f = mm.decode_jpeg_features(mm.attach_jpeg_payload(empty))
    assert f.count() == 0
    assert set(f.columns) == {
        "doc_id", "width", "height", "mean_luma", "grad_energy", "rgb_checksum",
    }
    small = spark.createDataFrame([(0,), (1,), (4,)], sch)
    rows = {
        r.doc_id: r
        for r in mm.decode_jpeg_features(mm.attach_jpeg_payload(small)).collect()
    }
    for doc_id, r in rows.items():
        w, h, planes = _expected_planes(doc_id)
        y = planes[0].astype(np.int64)
        assert (r.width, r.height) == (w, h)
        assert r.mean_luma == (int(y.sum()) * 1_000_000 // (w * h)) / 1_000_000
        assert r.grad_energy == int(np.abs(np.diff(y, axis=1)).sum())
    hashes = {
        r.doc_id: r.dhash
        for r in mm.decode_jpeg_dhash(mm.attach_jpeg_payload(small)).collect()
    }
    for doc_id, dh in hashes.items():
        w, h, planes = _expected_planes(doc_id)
        assert dh == mm._dhash56(w, h, planes[0].tobytes())


def test_jpeg420_round_trip_and_structure():
    """4:2:0 streams decode to exactly the formula + pixel-replication
    replay; the SOF carries 0x22 luma sampling; 4:2:2 factors and
    non-MCU-aligned dims are rejected."""
    S = np.asarray(mm._JPEG_IDCT_S, dtype=np.int64)
    M = np.einsum("ux,vy->vuyx", S, S).reshape(64, 64)

    def expected(doc_id):
        w, h = mm._jpeg420_dims(doc_id)
        planes = []
        for comp, (cw, ch) in ((0, (w, h)), (1, (w // 2, h // 2)), (2, (w // 2, h // 2))):
            q = mm._JPEG_QT_LUMA if comp == 0 else mm._JPEG_QT_CHROMA
            plane = np.zeros((ch, cw), dtype=np.uint8)
            for by in range(ch // 8):
                for bx in range(cw // 8):
                    zz = mm._jpeg_block_coefs(doc_id, comp, bx, by)
                    coef = np.zeros(64, dtype=np.int64)
                    for kk in range(64):
                        coef[mm._JPEG_ZIGZAG[kk]] = zz[kk] * q[kk]
                    px = np.clip(128 + ((coef @ M) + (1 << 23) >> 24), 0, 255)
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        px.reshape(8, 8).astype(np.uint8)
                    )
            if (cw, ch) != (w, h):
                plane = np.repeat(np.repeat(plane, 2, axis=0), 2, axis=1)
            planes.append(plane)
        return w, h, planes

    for doc_id in (0, 1, 5, 9, 14):
        data = mm._jpeg420_bytes(doc_id)
        w, h, planes = mm._jpeg_decode(data)
        ew, eh, ep = expected(doc_id)
        assert (w, h) == (ew, eh)
        for c in range(3):
            assert np.array_equal(planes[c], ep[c]), (doc_id, c)

    data = mm._jpeg420_bytes(2)
    sof = data.index(b"\xff\xc0")
    assert data[sof + 11] == 0x22  # luma 2x2 sampling declared

    # 3x1 luma is NOT a supported layout (4:2:2 is, since r16 — but a
    # 2x2 stream re-declared as 2x1 misaligns, not silently decodes:
    # the MCU walk then reads a different block count than was coded)
    with pytest.raises(ValueError, match="sampling factors"):
        mm._jpeg_decode(_corrupt(data, **{f"_{sof + 11}": 0x31}))

    # dims not MCU-aligned: claim h = 24 (not a multiple of 16)
    bad = bytearray(data)
    bad[sof + 5 : sof + 7] = (24).to_bytes(2, "big")
    with pytest.raises(ValueError, match="MCU-aligned"):
        mm._jpeg_decode(bytes(bad))


def test_jpeg_progressive_reconverges_with_baseline():
    """The nine-scan progressive stream (spectral selection + two-level
    successive approximation) must decode to pixels BIT-IDENTICAL to
    the single-scan baseline stream of the same coefficient field —
    progressive entropy coding is lossless, so any divergence is a
    decoder bug, in both 4:4:4 and 4:2:0 layouts."""
    for doc_id in range(16):
        base = mm._jpeg_decode(mm._jpeg_bytes(doc_id, restart_interval=0))
        prog = mm._jpeg_decode(mm._jpeg_prog_bytes(doc_id))
        assert (base[0], base[1]) == (prog[0], prog[1])
        for c in range(3):
            assert np.array_equal(base[2][c], prog[2][c]), (doc_id, c)
    for doc_id in (0, 1, 5, 9, 14):
        base = mm._jpeg_decode(mm._jpeg420_bytes(doc_id))
        prog = mm._jpeg_decode(mm._jpeg_prog_bytes(doc_id, layout="420"))
        assert (base[0], base[1]) == (prog[0], prog[1])
        for c in range(3):
            assert np.array_equal(base[2][c], prog[2][c]), (doc_id, c)


def test_jpeg_progressive_stream_structure():
    """The progressive payload is structurally a REAL SOF2 multi-scan
    stream: SOF2 marker, one DHT block, NINE SOS segments (DC first,
    4 AC first, DC refine, 3 AC refine), their scan headers carrying
    the documented Ss/Se/Ah/Al ladder."""
    import struct

    data = mm._jpeg_prog_bytes(7)
    assert data.index(b"\xff\xc2") > 0
    assert b"\xff\xc0" not in data[: data.index(b"\xff\xda")]
    headers = []
    i = 2
    while i + 2 <= len(data):
        assert data[i] == 0xFF
        marker = data[i + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        if marker == 0xDA:
            body = data[i + 4 : i + 2 + seglen]
            ns = body[0]
            ss, se, ahl = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            headers.append((ns, ss, se, ahl >> 4, ahl & 15))
            # skip entropy bytes to the next marker
            j = i + 2 + seglen
            while j + 1 < len(data) and not (
                data[j] == 0xFF and data[j + 1] != 0x00
            ):
                j += 1
            i = j
            continue
        i += 2 + seglen
    assert headers == [
        (3, 0, 0, 0, 1),   # DC first, interleaved, Al=1
        (1, 1, 5, 0, 1),   # AC first, luma low band
        (1, 6, 63, 0, 1),  # AC first, luma high band (pure EOBRUN)
        (1, 1, 63, 0, 1),  # AC first, Cb
        (1, 1, 63, 0, 1),  # AC first, Cr
        (3, 0, 0, 1, 0),   # DC refinement (raw bits)
        (1, 1, 63, 1, 0),  # AC refinement, Y
        (1, 1, 63, 1, 0),  # AC refinement, Cb
        (1, 1, 63, 1, 0),  # AC refinement, Cr
    ]


def _drop_scan(data: bytes, index: int) -> bytes:
    """Remove the index-th SOS segment (header + entropy bytes)."""
    import struct

    i = 2
    seen = 0
    while i + 2 <= len(data):
        marker = data[i + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        if marker == 0xDA:
            j = i + 2 + seglen
            while j + 1 < len(data) and not (
                data[j] == 0xFF and data[j + 1] != 0x00
            ):
                j += 1
            if seen == index:
                return data[:i] + data[j:]
            seen += 1
            i = j
            continue
        i += 2 + seglen
    raise AssertionError("scan index out of range")


def test_jpeg_progressive_rejection_matrix():
    """Progressive streams the decoder cannot FAITHFULLY decode raise
    ValueError — approximate pixels are never passed off as a decode."""
    good = mm._jpeg_prog_bytes(5)

    # dropping the DC first scan: AC scan arrives before DC coverage
    with pytest.raises(ValueError, match="AC scan before DC scan"):
        mm._jpeg_decode(_drop_scan(good, 0))

    # dropping an AC refinement scan: stream ends not fully refined
    with pytest.raises(ValueError, match="not refined to full precision"):
        mm._jpeg_decode(_drop_scan(good, 7))

    # dropping an AC first scan: the following refinement scan's
    # entropy misaligns against the now-absent history (ValueError
    # either from the Huffman walk or the band-coverage audit)
    with pytest.raises(ValueError):
        mm._jpeg_decode(_drop_scan(good, 3))

    # DRI claimed but no restart markers present (r16: progressive
    # restarts are now DECODED, so the failure mode is a missing RSTn
    # at the first boundary, the baseline discipline)
    sos = good.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    with pytest.raises(ValueError, match="expected JPEG restart"):
        mm._jpeg_decode(good[:sos] + dri + good[sos:])

    # out-of-sequence restart marker in a progressive stream
    rst_stream = mm._jpeg_prog_bytes(5, restart_interval=2)
    first_rst = rst_stream.index(b"\xff\xd0")
    broken_rst = bytearray(rst_stream)
    broken_rst[first_rst + 1] = 0xD4
    with pytest.raises(ValueError, match="out of sequence"):
        mm._jpeg_decode(bytes(broken_rst))

    # truncated mid-scan
    with pytest.raises(ValueError):
        mm._jpeg_decode(good[: len(good) * 2 // 3])

    # multi-component AC scan: find the first AC SOS (ns=1) and check
    # the decoder validates Ss>0 => ns==1 (corrupt ns to 2 would break
    # lengths, so instead corrupt a DC header's Se to 5: Ss=0, Se>0)
    import struct

    i = 2
    while True:
        if good[i + 1] == 0xDA:
            (seglen,) = struct.unpack(">H", good[i + 2 : i + 4])
            body_at = i + 4
            ns = good[body_at]
            se_at = body_at + 2 + 2 * ns
            broken = bytearray(good)
            broken[se_at] = 5  # DC scan claiming Se=5
            with pytest.raises(ValueError, match="spectral selection"):
                mm._jpeg_decode(bytes(broken))
            break
        (seglen,) = struct.unpack(">H", good[i + 2 : i + 4])
        i += 2 + seglen

    # successive approximation skipping a bit level (Ah=2, Al=0 — a
    # two-bit jump; note 0x21 would be a LEGAL Ah=2→Al=1 refinement,
    # which the full-precision audit rejects instead)
    # — corrupt the DC refinement scan's Ah/Al byte to 0x20
    scans = []
    i = 2
    while i + 2 <= len(good):
        if good[i + 1] == 0xD9:
            break
        (seglen,) = struct.unpack(">H", good[i + 2 : i + 4])
        if good[i + 1] == 0xDA:
            scans.append(i)
            j = i + 2 + seglen
            while j + 1 < len(good) and not (
                good[j] == 0xFF and good[j + 1] != 0x00
            ):
                j += 1
            i = j
            continue
        i += 2 + seglen
    dc_refine_at = scans[5]
    (seglen,) = struct.unpack(">H", good[dc_refine_at + 2 : dc_refine_at + 4])
    ns = good[dc_refine_at + 4]
    ahl_at = dc_refine_at + 4 + 1 + 2 * ns + 2
    with pytest.raises(ValueError, match="step by one bit"):
        mm._jpeg_decode(_corrupt(good, **{f"_{ahl_at}": 0x20}))
    # the header-legal Ah=2→Al=1 variant now trips the CROSS-scan
    # continuity check (review r16): the first pass coded Al=1, so a
    # refinement claiming Ah=2 skips nothing coded
    with pytest.raises(ValueError, match="discontinuity"):
        mm._jpeg_decode(_corrupt(good, **{f"_{ahl_at}": 0x21}))

    # and the good stream still decodes after all that
    w, h, planes = mm._jpeg_decode(good)
    assert (w, h) == mm._jpeg_dims(5) and len(planes) == 3


def test_jpeg_progressive_dhash_identical_to_baseline(spark, sf_dir):
    """Cross-container dedup comparability: a doc's progressive payload
    decodes to the same pixels as its baseline payload, so
    decode_jpeg_dhash over the jpegprog store column equals the jpeg
    column's hashes exactly — a production image-dedup pass mixes
    containers and must treat them as the same image."""
    base = {
        r.doc_id: (r.width, r.height, r.dhash)
        for r in mm.decode_jpeg_dhash(
            mm.payload_view(spark, sf_dir, "jpeg").limit(30)
        ).collect()
    }
    prog = {
        r.doc_id: (r.width, r.height, r.dhash)
        for r in mm.decode_jpeg_dhash(
            mm.payload_view(spark, sf_dir, "jpegprog").limit(30)
        ).collect()
    }
    assert base and base == {d: prog[d] for d in base}


def test_jpeg422_round_trip_matches_formula_replay():
    """4:2:2 (video-derived, 2×1 luma) decode must equal the formula
    replay: luma full-res, chroma half-res in x only, x-replication
    upsample — the third verified shape of the generic MCU machinery.
    Progressive 4:2:2 must reconverge with the baseline stream."""
    S = np.asarray(mm._JPEG_IDCT_S, dtype=np.int64)
    M = np.einsum("ux,vy->vuyx", S, S).reshape(64, 64)

    def expected(doc_id):
        w, h = mm._jpeg422_dims(doc_id)
        planes = []
        for comp in range(3):
            q = mm._JPEG_QT_LUMA if comp == 0 else mm._JPEG_QT_CHROMA
            cw = w if comp == 0 else w // 2
            plane = np.zeros((h, cw), dtype=np.uint8)
            for by in range(h // 8):
                for bx in range(cw // 8):
                    zz = mm._jpeg_block_coefs(doc_id, comp, bx, by)
                    coef = np.zeros(64, dtype=np.int64)
                    for kk in range(64):
                        coef[mm._JPEG_ZIGZAG[kk]] = zz[kk] * q[kk]
                    px = 128 + ((coef @ M) + (1 << 23) >> 24)
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        np.clip(px, 0, 255).astype(np.uint8).reshape(8, 8)
                    )
            if comp:
                plane = np.repeat(plane, 2, axis=1)
            planes.append(plane)
        return w, h, planes

    for doc_id in (0, 1, 5, 9, 14):
        data = mm._jpeg422_bytes(doc_id)
        sof = data.index(b"\xff\xc0")
        assert data[sof + 11] == 0x21  # luma 2x1 sampling declared
        w, h, planes = mm._jpeg_decode(data)
        ew, eh, ep = expected(doc_id)
        assert (w, h) == (ew, eh)
        for c in range(3):
            assert np.array_equal(planes[c], ep[c]), (doc_id, c)
        # progressive 4:2:2 reconverges bit-for-bit
        prog = mm._jpeg_decode(mm._jpeg_prog_bytes(doc_id, layout="422"))
        assert (prog[0], prog[1]) == (w, h)
        for c in range(3):
            assert np.array_equal(prog[2][c], planes[c]), (doc_id, c)


def test_jpeg_progressive_noninterleaved_dc_scans_decode_in_raster_order():
    """Single-component DC scans (legal per T.81 A.2.2, produced by
    jpegtran/mozjpeg scan scripts) walk the component's OWN grid in
    raster order — which differs from the MCU sub-order for subsampled
    luma.  Review r16: the MCU-order-only walk silently mis-decoded
    these for 4:2:0/4:2:2; all six layout x DC-scan-shape combinations
    must reconverge with the baseline pixels."""
    for layout, base_bytes in (
        ("444", lambda d: mm._jpeg_bytes(d, restart_interval=0)),
        ("420", mm._jpeg420_bytes),
        ("422", mm._jpeg422_bytes),
    ):
        for dc_interleaved in (True, False):
            for restart_interval in (0, 2):
                for doc_id in (0, 5, 9):
                    base = mm._jpeg_decode(base_bytes(doc_id))
                    prog = mm._jpeg_decode(
                        mm._jpeg_prog_bytes(
                            doc_id,
                            layout=layout,
                            dc_interleaved=dc_interleaved,
                            restart_interval=restart_interval,
                        )
                    )
                    for c in range(3):
                        assert np.array_equal(base[2][c], prog[2][c]), (
                            layout,
                            dc_interleaved,
                            restart_interval,
                            doc_id,
                            c,
                        )


def test_jpeg_progressive_sa_discontinuity_across_scans_rejected():
    """Successive-approximation continuity is validated ACROSS scans
    (review r16): a DC first scan at Al=3 followed by an Ah=1->Al=0
    refinement passes every per-scan header check and the final al==0
    audit, yet bits 2..1 were never coded — the decoder must refuse,
    not hand back wrong pixels."""
    import struct

    good = mm._jpeg_prog_bytes(5)
    # first SOS is the interleaved DC first scan; its Ah/Al byte is the
    # last byte of the scan header
    sos = good.index(b"\xff\xda")
    (seglen,) = struct.unpack(">H", good[sos + 2 : sos + 4])
    ahl_at = sos + 2 + seglen - 1
    assert good[ahl_at] == 0x01  # Ah=0, Al=1
    broken = bytearray(good)
    broken[ahl_at] = 0x03  # Al=3: a legal first scan, but the 1->0
    # refinement later now skips bit levels 2..1
    with pytest.raises(ValueError, match="discontinuity"):
        mm._jpeg_decode(bytes(broken))


def test_jpeg_progressive_many_components_reject_cleanly():
    """A 5-component all-1x1 SOF2 passes the sampling gate; the decoder
    must track per-component DC state dynamically (review r16: fixed
    4-slot arrays leaked IndexError past the ValueError contract when a
    scan touched component index 4)."""
    import struct

    dc_l = mm._jpeg_canonical_codes(*mm._JPEG_STD_DC_LUMA)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0x00]) + bytes(mm._JPEG_QT_LUMA))
    sof = struct.pack(">BHHB", 8, 8, 8, 5)
    for cid in range(1, 6):
        sof += bytes([cid, 0x11, 0])
    out += seg(0xFFC2, sof)
    bits, vals = mm._JPEG_STD_DC_LUMA
    out += seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    # single-component DC first scan naming component 5 (index 4)
    out += seg(0xFFDA, bytes([1, 5, 0x00, 0, 0, 0x00]))
    bw = mm._JpegBitWriter()
    code, ln = dc_l[0]  # one block, diff 0
    bw.put(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"
    # components 1..4 never got DC scans: ValueError, never IndexError
    with pytest.raises(ValueError, match="undecoded components"):
        mm._jpeg_decode(bytes(out))


def test_jpeg_zrl_overflowing_band_rejected():
    """A ZRL that pushes the coefficient index past the band/block end
    is structurally invalid (ZRL is never terminal — a coefficient must
    follow): both decoders raise instead of silently accepting the
    early-terminated block (review r16 asymmetry)."""
    import struct

    # progressive: corrupt the luma AC first scan's first symbol into
    # ZRL repeatedly — band 1..5 cannot absorb 16 zeros
    good = mm._jpeg_prog_bytes(5)
    scans = []
    i = 2
    while i + 2 <= len(good):
        if good[i + 1] == 0xD9:
            break
        (seglen,) = struct.unpack(">H", good[i + 2 : i + 4])
        if good[i + 1] == 0xDA:
            scans.append((i, i + 2 + seglen))
            j = i + 2 + seglen
            while j + 1 < len(good) and not (
                good[j] == 0xFF and good[j + 1] != 0x00
            ):
                j += 1
            i = j
            continue
        i += 2 + seglen
    # scan 1 (luma band 1..5): overwrite its entropy head with the
    # 3-bit ZRL code (0b011 per the prog table order: 00 EOB, 010
    # 0x01, ... ) — force-fill a byte of ZRLs
    zrl_code, zrl_len = mm._jpeg_canonical_codes(*mm._JPEG_PROG_AC)[0xF0]
    byte = 0
    nbits = 0
    while nbits + zrl_len <= 8:
        byte = (byte << zrl_len) | zrl_code
        nbits += zrl_len
    byte = (byte << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
    _start, entropy_at = scans[1]
    broken = bytearray(good)
    broken[entropy_at] = byte
    with pytest.raises(ValueError, match="overflows band|invalid Huffman|truncated"):
        mm._jpeg_decode(bytes(broken))


def test_jpeg_progressive_duplicate_sof_rejected():
    """ADVICE r16 (medium): a second SOF2 segment (here with differing
    dims) must reject by NAME — before the fix it appended to
    geom/coefs and desynchronized every component index below,
    surfacing as IndexError past the ValueError-only contract."""
    import struct

    good = mm._jpeg_prog_bytes(5)
    i = 2
    while True:
        marker = good[i + 1]
        (seglen,) = struct.unpack(">H", good[i + 2 : i + 4])
        if marker == 0xC2:
            dup_body = bytearray(good[i + 4 : i + 2 + seglen])
            dup_body[1:3] = struct.pack(">H", 16)  # different height
            dup = (
                b"\xff\xc2"
                + struct.pack(">H", len(dup_body) + 2)
                + bytes(dup_body)
            )
            broken = good[: i + 2 + seglen] + dup + good[i + 2 + seglen :]
            with pytest.raises(ValueError, match="duplicate SOF"):
                mm._jpeg_decode(broken)
            break
        i += 2 + seglen


def test_jpeg_progressive_refinement_run_overflow_rejected():
    """ADVICE r16 (low): an AC REFINEMENT scan whose coded
    new-coefficient symbol's zero-run overflows the band must raise —
    before the fix the coefficient was silently dropped (asymmetric
    with the AC-first pass's overflow raise), so a corrupt refinement
    could desynchronize yet pass the final audits with wrong
    coefficients.  Craft: replace the last AC refinement scan with one
    emitting five (r=15, s=1) symbols — ≥16 band slots each, 4×16 > 63
    guarantees the run exits the band with the new value unplaced."""
    import struct

    good = mm._jpeg_prog_bytes(5)
    trunc = _drop_scan(good, 8)  # comp-3 AC refinement is the 9th scan
    assert trunc.endswith(b"\xff\xd9")
    body = bytes([1, 3, 0x10, 1, 63, (1 << 4) | 0])  # ns=1 comp3 ss=1 se=63 ah=1 al=0
    hdr = struct.pack(">HH", 0xFFDA, len(body) + 2) + body
    prog_ac = mm._jpeg_canonical_codes(*mm._JPEG_PROG_AC)
    code, ln = prog_ac[0xF1]
    bw = mm._JpegBitWriter()
    # comp-3 block 0 carries exactly three history (|coef| >= 2) slots in
    # the band at doc 5; the first symbol's 16-zero run passes all three,
    # so supply their correction bits to keep the entropy aligned
    bw.put(code, ln)
    bw.put(1, 1)
    bw.put(0, 3)
    for _ in range(3):
        bw.put(code, ln)
        bw.put(1, 1)
    corrupt = trunc[:-2] + hdr + bw.flush() + b"\xff\xd9"
    with pytest.raises(ValueError, match="JPEG AC run overflows band"):
        mm._jpeg_decode(corrupt)
