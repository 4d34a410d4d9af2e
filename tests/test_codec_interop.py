"""Independent-encoder interop fixtures for the stdlib codecs.

The property suites pin progressive≡baseline and palette≡direct-RGB, but
BOTH sides of those equalities run through in-repo encoders — an
encoder/decoder pair could share one misreading of T.81 / RFC 2083 and
still round-trip. These tests close that matched-pair risk: each fixture
is assembled BYTE BY BYTE in the test itself, straight from the
specification, sharing no code with jpeg.py / multimodal.py —

- the JPEG carries CUSTOM Huffman tables (different code lengths than
  encode_jpeg's flat-length tables) and a custom quant table, with the
  entropy bits hand-packed, so decode must come from the stream's DHT,
  not any baked-in constant;
- the PNG carries a zlib stream built from a hand-written STORED
  deflate block (no zlib.compress) with hand-computed Adler-32, and
  scanlines filtered by hand (Sub and Up deltas computed on paper).

Expected pixels are computed arithmetically in comments, not by running
any in-repo code.
"""

import struct

import numpy as np

from victorialogs_spark.datapipe.jpeg import decode_jpeg
from victorialogs_spark.datapipe.multimodal import _decode_png


def test_decode_handwritten_jpeg_custom_tables():
    """16x8 greyscale, two DC-only blocks, hand-packed entropy bits.

    Custom canonical DC table (counts: one 1-bit, one 2-bit code):
      category 2 -> "0", category 0 -> "10"   (encode_jpeg's tables give
      every category the same length — these lengths prove the decoder
      builds codes from THIS stream's DHT).
    Custom AC table: EOB (0x00) -> "0".
    Quant table: all 3s (q00 = 3).

    Block 1: DC diff +3 = category 2, extra bits "11"; ACs all zero.
      dc = 3, dequantized 3*3 = 9; flat block value =
      floor((9 + 4) / 8) + 128 = 129.
    Block 2: DC diff -2 = category 2, extra bits (two's-complement
      convention: v + 2^cat - 1 = 1) "01"; dc = 3 - 2 = 1, deq 3;
      value = floor((3 + 4) / 8) + 128 = 128.
    Entropy bits: 0 11 0 | 0 01 0 = 01100010 = 0x62 (exactly one byte,
      no padding needed).
    """
    jpg = bytearray(b"\xff\xd8")  # SOI
    # DQT: pq=0 tq=0, 64 entries (zigzag order; all equal so order moot)
    jpg += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x03" * 64
    # SOF0: precision 8, height 8, width 16, 1 component (id 1, 1x1, tq 0)
    jpg += b"\xff\xc0" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 16, 1, 1, 0x11, 0]
    )
    # DHT: DC table 0 — counts [1,1,0*14], symbols [2, 0]
    dc_counts = bytes([1, 1] + [0] * 14)
    dc_syms = bytes([2, 0])
    # DHT: AC table 0 — counts [1,0*15], symbol [0x00] (EOB)
    ac_counts = bytes([1] + [0] * 15)
    ac_syms = bytes([0x00])
    dht = b"\x00" + dc_counts + dc_syms + b"\x10" + ac_counts + ac_syms
    jpg += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    # SOS: 1 component (id 1, DC table 0 / AC table 0), Ss=0 Se=63 AhAl=0
    jpg += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    jpg += b"\x62"  # the hand-packed entropy byte
    jpg += b"\xff\xd9"  # EOI

    px = decode_jpeg(bytes(jpg))
    assert px.shape == (8, 16, 3)
    assert (px[:, :8] == 129).all()
    assert (px[:, 8:] == 128).all()


def _adler32_by_hand(data: bytes) -> int:
    # RFC 1950 §2.2, computed longhand (not zlib.adler32)
    a, b = 1, 0
    for byte in data:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    return (b << 16) | a


def _crc32_by_hand(data: bytes) -> int:
    # RFC 2083 §15, bitwise (no table, no zlib.crc32)
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0xEDB88320 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def test_decode_handwritten_png_stored_deflate():
    """4x2 RGB, zlib stream hand-built from one STORED deflate block,
    scanlines filtered by hand (row 0: Sub, row 1: Up).

    Pixels (RGB):
      row0: (10,20,30) (15,25,35) (255,0,128) (0,255,1)
      row1: (12,22,32) (17,27,37) (1,2,3)     (200,100,50)
    Sub-filtered row0 (cur[x] - cur[x-3] mod 256):
      10,20,30, 5,5,5, 240,231,93, 1,255,129
    Up-filtered row1 (cur[x] - row0_raw[x] mod 256):
      2,2,2, 2,2,2, 2,2,131, 200,101,49
    """
    row0 = bytes([10, 20, 30, 15, 25, 35, 255, 0, 128, 0, 255, 1])
    row1 = bytes([12, 22, 32, 17, 27, 37, 1, 2, 3, 200, 100, 50])
    row0_f = bytes([10, 20, 30, 5, 5, 5, 240, 231, 93, 1, 255, 129])
    row1_f = bytes([2, 2, 2, 2, 2, 2, 2, 2, 131, 200, 101, 49])
    raw = b"\x01" + row0_f + b"\x02" + row1_f

    # zlib stream: CMF/FLG 0x78 0x01, one final STORED block (BFINAL=1,
    # BTYPE=00 -> first byte 0x01), LEN/NLEN little-endian, Adler-32
    stored = b"\x01" + struct.pack("<HH", len(raw), len(raw) ^ 0xFFFF) + raw
    idat = b"\x78\x01" + stored + struct.pack(">I", _adler32_by_hand(raw))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", _crc32_by_hand(ctype + data))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )

    px = _decode_png(png)
    want = np.array(
        [list(row0[i : i + 3]) for i in range(0, 12, 3)]
        + [list(row1[i : i + 3]) for i in range(0, 12, 3)],
        dtype=np.uint8,
    ).reshape(2, 4, 3)
    assert px.shape == (2, 4, 3)
    assert (px == want).all()
