"""TensorBoard event-file writer: decode the records back and check CRCs."""

import struct

from lamp_tpu.train.tb import TensorBoardWriter, crc32c, masked_crc


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        (n,) = struct.unpack_from("<Q", data, i)
        (hc,) = struct.unpack_from("<I", data, i + 8)
        assert hc == masked_crc(data[i:i + 8])
        payload = data[i + 12:i + 12 + n]
        (pc,) = struct.unpack_from("<I", data, i + 12 + n)
        assert pc == masked_crc(payload)
        out.append(payload)
        i += 12 + n + 4
    return out


def _parse_fields(msg):
    """Minimal proto walk: {field_num: value} (last wins)."""
    fields = {}
    i = 0
    while i < len(msg):
        key = 0
        shift = 0
        while True:
            b = msg[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = msg[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            (v,) = struct.unpack_from("<d", msg, i)
            i += 8
        elif wire == 5:
            (v,) = struct.unpack_from("<f", msg, i)
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = msg[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = msg[i:i + ln]
            i += ln
        else:  # pragma: no cover
            raise AssertionError(f"wire type {wire}")
        fields[num] = v
    return fields


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC-32C
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_events_roundtrip(tmp_path):
    with TensorBoardWriter(str(tmp_path)) as tb:
        tb.scalar("loss/train", 2.5, step=1)
        tb.scalar("loss/train", 1.25, step=2, wall_time=123.0)
        tb.scalars({"acc": 0.5, "lr": 1e-3}, step=2)
        path = tb.path

    records = _read_records(path)
    assert len(records) == 5  # file_version + 4 scalars

    first = _parse_fields(records[0])
    assert first[3] == b"brain.Event:2"

    ev = _parse_fields(records[2])
    assert ev[2] == 2 and ev[1] == 123.0
    val = _parse_fields(_parse_fields(ev[5])[1])
    assert val[1] == b"loss/train"
    assert abs(val[2] - 1.25) < 1e-7

    tags = set()
    for r in records[3:]:
        v = _parse_fields(_parse_fields(_parse_fields(r)[5])[1])
        tags.add(v[1])
    assert tags == {b"acc", b"lr"}
