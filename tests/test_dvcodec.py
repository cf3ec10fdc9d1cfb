"""Deletion-vector codec (sources/dvcodec.py) against the PUBLIC
specs: ZeroMQ RFC 32 Z85 vectors, hand-built RoaringFormatSpec byte
streams (all three container kinds, both cookies), Delta's
RoaringBitmapArray wrapper, the DV file framing (length + CRC32), and
descriptor resolution for i/u/p storage — no Spark session needed."""

from __future__ import annotations

import glob
import os
import struct
import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sport_advantages_moderne_data_infrastructure_spark.sources import (
    dvcodec as dc,
)


# -- Z85 ---------------------------------------------------------------------


def test_z85_rfc32_vector():
    # the spec's own test case (rfc.zeromq.org/spec/32)
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dc.z85_encode(raw) == "HelloWorld"
    assert dc.z85_decode("HelloWorld") == raw


def test_z85_alignment_and_alphabet_errors():
    with pytest.raises(ValueError, match="len % 4"):
        dc.z85_encode(b"abc")
    with pytest.raises(ValueError, match="len % 5"):
        dc.z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid z85"):
        dc.z85_decode('"""""')


def test_uuid_roundtrip():
    u = uuid.UUID("12345678-9abc-def0-1234-56789abcdef0")
    enc = dc.encode_uuid(u)
    assert len(enc) == 20
    assert dc.decode_uuid(enc) == u


# -- roaring32 ---------------------------------------------------------------


def test_roaring32_hand_vector():
    # {1,2,3}: cookie 12346 LE, 1 container, key 0 / card-1 2,
    # offset 16, then the three uint16 values
    b = dc.serialize_roaring32([1, 2, 3])
    assert b.hex() == ("3a300000" "01000000" "0000" "0200"
                       "10000000" "010002000300")
    vals, end = dc.deserialize_roaring32(b)
    assert vals == [1, 2, 3] and end == len(b)


def test_roaring32_bitmap_container_and_multikey():
    vals = list(range(10_000)) + [70_000, 0xFFFFFFFF]
    b = dc.serialize_roaring32(vals)
    got, end = dc.deserialize_roaring32(b)
    assert got == sorted(set(vals)) and end == len(b)


def test_roaring32_run_container_read():
    # hand-built cookie-12347 stream: one run container [5..9] — the
    # layout real writers emit after runOptimize(), which the no-run
    # writer never produces but the reader must accept
    stream = (struct.pack("<I", 12347 | (0 << 16)) + bytes([0b1])
              + struct.pack("<HH", 0, 4)    # key 0, card-1 = 4
              + struct.pack("<H", 1)        # 1 run
              + struct.pack("<HH", 5, 4))   # start 5, len-1 = 4
    vals, end = dc.deserialize_roaring32(stream)
    assert vals == [5, 6, 7, 8, 9] and end == len(stream)


def test_roaring32_rejects_garbage():
    with pytest.raises(ValueError, match="cookie"):
        dc.deserialize_roaring32(struct.pack("<I", 999) + b"\0" * 16)


@settings(max_examples=40, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=0xFFFFFFFF),
               max_size=300))
def test_roaring32_roundtrip_property(vals):
    b = dc.serialize_roaring32(vals)
    got, end = dc.deserialize_roaring32(b)
    assert got == sorted(vals) and end == len(b)


# -- RoaringBitmapArray (64-bit) ----------------------------------------------


def test_rbm_array_layout_and_roundtrip():
    vals = [0, 5, (1 << 32) + 7, (3 << 32) + 1, (3 << 32) + 99_999]
    data = dc.serialize_rbm_array(vals)
    magic, n = struct.unpack_from("<iq", data, 0)
    assert magic == dc.MAGIC == 1681511377
    assert n == 4  # dense by position: high words 0..3, 2 empty
    assert dc.deserialize_rbm_array(data) == sorted(vals)


def test_rbm_array_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        dc.deserialize_rbm_array(struct.pack("<iq", 42, 0))
    with pytest.raises(ValueError, match="short"):
        dc.deserialize_rbm_array(b"\x01\x02")


@settings(max_examples=25, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=(1 << 40)),
               max_size=200))
def test_rbm_array_roundtrip_property(vals):
    assert dc.deserialize_rbm_array(
        dc.serialize_rbm_array(vals)) == sorted(vals)


# -- descriptors + file framing ------------------------------------------------


def test_inline_descriptor_roundtrip(tmp_path):
    pos = [3, 4, 5, 50, 99, 70_000]
    d = dc.encode_inline(pos)
    assert d["storageType"] == "i" and d["cardinality"] == len(pos)
    assert len(d["pathOrInlineDv"]) % 5 == 0  # z85 block padding
    assert dc.decode_descriptor(str(tmp_path), d) == sorted(pos)


def test_u_storage_file_roundtrip(tmp_path):
    root = str(tmp_path)
    masks = [[1, 2, 3], [10, 20], list(range(5000))]
    descs = dc.write_dv_file(root, masks)
    assert [d["storageType"] for d in descs] == ["u"] * 3
    for d, want in zip(descs, masks):
        assert dc.decode_descriptor(root, d) == want
    # one shared file, offsets distinct, version byte 1 at start
    f = glob.glob(os.path.join(root, "deletion_vector_*.bin"))
    assert len(f) == 1
    assert open(f[0], "rb").read(1) == b"\x01"
    assert len({d["offset"] for d in descs}) == 3
    # prefixed variant (the random-prefix layout real writers use)
    dp = dc.write_dv_file(root, [[42]], prefix="ab")[0]
    assert dp["pathOrInlineDv"].startswith("ab")
    assert dc.decode_descriptor(root, dp) == [42]


def test_p_storage_and_corruption(tmp_path):
    root = str(tmp_path)
    descs = dc.write_dv_file(root, [[7, 8]])
    f = glob.glob(os.path.join(root, "deletion_vector_*.bin"))[0]
    dp = {**descs[0], "storageType": "p", "pathOrInlineDv": f}
    assert dc.decode_descriptor(root, dp) == [7, 8]
    # flip one payload byte: CRC must catch it
    raw = bytearray(open(f, "rb").read())
    raw[6] ^= 0xFF
    open(f, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum mismatch"):
        dc.decode_descriptor(root, descs[0])


def test_descriptor_error_surface(tmp_path):
    root = str(tmp_path)
    with pytest.raises(ValueError, match="malformed deletion vector"):
        dc.decode_descriptor(root, {"storageType": "u"})
    with pytest.raises(ValueError, match="unknown deletion-vector"):
        dc.decode_descriptor(root, {
            "storageType": "x", "pathOrInlineDv": "", "sizeInBytes": 0})
    # cardinality drift fails loudly (silently masking the wrong
    # number of rows is the one unrecoverable failure mode)
    d = dc.encode_inline([1, 2, 3])
    d["cardinality"] = 2
    with pytest.raises(ValueError, match="cardinality mismatch"):
        dc.decode_descriptor(root, d)
    # descriptor length drift on a framed file
    descs = dc.write_dv_file(root, [[1]])
    bad = {**descs[0], "sizeInBytes": descs[0]["sizeInBytes"] + 4}
    with pytest.raises(ValueError, match="length mismatch"):
        dc.decode_descriptor(root, bad)
