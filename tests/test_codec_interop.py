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
  scanlines filtered by hand (Sub and Up deltas computed on paper);
- the PROGRESSIVE JPEG is three hand-packed scans (DC-first with a
  point transform, an AC-first EOB-run scan, a DC refinement) so the
  multi-scan coefficient accumulation is pinned by the spec, not by
  the in-repo progressive encoder;
- the GIFs carry LZW code streams packed by hand (variable width,
  LSB-first — every code and its bit offset derived in comments),
  covering the width transition, the KwKwK case, the 4-pass
  interlace, 89a extension skipping, and local color tables;
- the TIFFs carry a hand-run PackBits strip (big-endian IFD), a
  hand-traced TIFF-variant LZW stream (MSB-first 9-bit codes derived
  in comments) under the horizontal predictor (little-endian IFD),
  and a hand-packed 4-bit grayscale strip (MSB-first sub-byte
  samples with per-row pad bits).

Expected pixels are computed arithmetically in comments, not by running
any in-repo code.
"""

import struct

import numpy as np

from victorialogs_spark.datapipe.gif import decode_gif
from victorialogs_spark.datapipe.jpeg import decode_jpeg
from victorialogs_spark.datapipe.multimodal import _decode_png
from victorialogs_spark.datapipe.tiff import decode_tiff


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

def test_decode_handwritten_progressive_jpeg():
    """16x8 greyscale, SOF2, three hand-packed scans (T.81 Annex G).

    Same custom quant (all 3s) as the baseline fixture; final DCs are
    3 and 1 post-quant, assembled ACROSS scans:

    Scan 1 — DC first, Al=1 (successive approximation: coded values
      are dc>>1, shifted back left on decode). dc>>1: block 1 -> 1,
      block 2 -> 0. Diffs: +1, then 0-1 = -1. Custom DC table (counts
      one 1-bit, one 2-bit code; symbols [1, 0]): category 1 -> "0",
      category 0 -> "10". Bits: b1 "0"+"1" (cat 1, +1), b2 "0"+"0"
      (cat 1, -1 codes as v+2^cat-1 = 0). "0100" + 1-padding = 0x4F.
    Scan 2 — AC first, Ss=1 Se=63 Ah=0 Al=0. All ACs zero: one EOB
      run covering both blocks. Custom AC table: single symbol 0x10
      (EOBn, n=1) -> code "0"; eobrun = (1<<1) + extra bit "0" = 2.
      "00" + 1-padding = 0x3F.
    Scan 3 — DC refinement, Ah=1 Al=0: one RAW bit per block (no
      Huffman), appended at Al: both low bits are 1. "11" + 1-padding
      = 0xFF, which must be byte-stuffed to FF 00 in entropy data.

    Final: dc1 = (1<<1)|1 = 3, dc2 = (0<<1)|1 = 1; dequantized 9 and
    3; flat DC-only blocks: floor((9+4)/8)+128 = 129 and
    floor((3+4)/8)+128 = 128 — identical to the baseline fixture's
    expectation, reached through the progressive path.
    """
    jpg = bytearray(b"\xff\xd8")
    jpg += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x03" * 64
    # SOF2 (progressive): precision 8, h 8, w 16, 1 component
    jpg += b"\xff\xc2" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 16, 1, 1, 0x11, 0]
    )
    dht = b"\x00" + bytes([1, 1] + [0] * 14) + bytes([1, 0])
    dht += b"\x10" + bytes([1] + [0] * 15) + bytes([0x10])
    jpg += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    jpg += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0, 0, 0, 0x01])
    jpg += b"\x4f"
    jpg += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0, 1, 63, 0x00])
    jpg += b"\x3f"
    jpg += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0, 0, 0, 0x10])
    jpg += b"\xff\x00"  # 0xFF entropy byte, stuffed
    jpg += b"\xff\xd9"

    px = decode_jpeg(bytes(jpg))
    assert px.shape == (8, 16, 3)
    assert (px[:, :8] == 129).all()
    assert (px[:, 8:] == 128).all()


def test_decode_handwritten_gif_sequential():
    """3x2 GIF87a, 4-color global table, LZW packed by hand.

    Indexes: row0 = 0 1 2, row1 = 2 1 0. min_code_size 2 => clear=4,
    EOI=5, first width 3. Encoding trace (code@width, dictionary adds):
      clear 4@3
      0@3 (emit [0], add [0,1]=6)
      1@3 (emit [1], add [1,2]=7)
      2@3 (emit [2], add [2,2]=8 -> next=9 = (1<<3)+1 -> width 4)
      2@4 (emit [2], add [2,1]=9)
      1@4 (emit [1], add [1,0]=10)
      0@4 (emit [0])
      EOI 5@4
    LSB-first packing: 4 + (0<<3) + (1<<6) + (2<<9) + (2<<12) +
    (1<<16) + (0<<20) + (5<<24) = 0x05012444 -> bytes 44 24 01 05.
    """
    gif = bytearray(b"GIF87a")
    gif += struct.pack("<HHBBB", 3, 2, 0x81, 0, 0)  # GCT, 4 entries
    gif += bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 2, 0x00)
    gif += b"\x02"  # min code size
    gif += b"\x04" + bytes([0x44, 0x24, 0x01, 0x05]) + b"\x00"
    gif += b"\x3b"

    px = decode_gif(bytes(gif))
    want = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[0, 0, 255], [0, 255, 0], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert px.shape == (2, 3, 3)
    assert (px == want).all()


def test_decode_handwritten_gif_kwkwk():
    """3x5 GIF87a of a single index — forces the KwKwK code-not-yet-
    in-table case on EVERY non-root code.

    Fifteen 1s, min_code_size 2. Greedy LZW emits runs of growing
    length 1,2,3,4,5:
      clear 4@3
      1@3 (emit [1],    add [1,1]=6)
      6@3 (emit [1,1],  add [1,1,1]=7)      <- decoder table has no 6 yet
      7@3 (emit [1]*3,  add [1]*4=8 -> width 4)
      8@4 (emit [1]*4,  add [1]*5=9)
      9@4 (emit [1]*5)
      EOI 5@4
    Packing: 4 + (1<<3) + (6<<6) + (7<<9) + (8<<12) + (9<<16) +
    (5<<20) = 0x598F8C -> bytes 8C 8F 59.
    """
    gif = bytearray(b"GIF87a")
    gif += struct.pack("<HHBBB", 3, 5, 0x81, 0, 0)
    gif += bytes([1, 2, 3, 40, 50, 60, 7, 8, 9, 0, 0, 0])
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 5, 0x00)
    gif += b"\x02"
    gif += b"\x03" + bytes([0x8C, 0x8F, 0x59]) + b"\x00"
    gif += b"\x3b"

    px = decode_gif(bytes(gif))
    assert px.shape == (5, 3, 3)
    assert (px == np.array([40, 50, 60], np.uint8)).all()


def test_decode_handwritten_gif_interlaced_local_table():
    """1x5 GIF89a: interlaced, LOCAL color table, extensions to skip.

    Display-order column indexes (top to bottom): 0 1 2 3 0. The 4-pass
    interlace stores rows in order 0,4,2,1,3 (every 8th from 0, every
    8th from 4, every 4th from 2, every 2nd from 1), so the stored
    index stream is 0 0 2 1 3:
      clear 4@3
      0@3 (emit [0], add [0,0]=6)
      0@3 (emit [0], add [0,2]=7)
      2@3 (emit [2], add [2,1]=8 -> width 4)
      1@4 (emit [1], add [1,3]=9)
      3@4 (emit [3])
      EOI 5@4
    Packing: 4 + (0<<3) + (0<<6) + (2<<9) + (1<<12) + (3<<16) +
    (5<<20) = 0x531404 -> bytes 04 14 53.

    The screen descriptor carries NO global table; the image descriptor
    sets interlace (0x40) + local table (0x80, size field 1). A Graphic
    Control Extension and a Comment precede the image and must be
    skipped by their sub-block structure.
    """
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 1, 5, 0x00, 0, 0)  # no global table
    gif += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: len 4 + terminator
    gif += b"\x21\xfe\x05hello\x00"  # comment extension
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 5, 0x40 | 0x80 | 0x01)
    gif += bytes([10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42])
    gif += b"\x02"
    gif += b"\x03" + bytes([0x04, 0x14, 0x53]) + b"\x00"
    gif += b"\x3b"

    px = decode_gif(bytes(gif))
    want = np.array(
        [[[10, 11, 12]], [[20, 21, 22]], [[30, 31, 32]],
         [[40, 41, 42]], [[10, 11, 12]]],
        dtype=np.uint8,
    )
    assert px.shape == (5, 1, 3)
    assert (px == want).all()


def test_decode_handwritten_tiff_packbits_bigendian():
    """4x3 grayscale TIFF, MM (big-endian), PackBits, two hand runs.

    Pixel rows (grey): AA AA AA AA / 10 20 30 40 / 55 55 66 77 (hex).
    PackBits (TIFF 6.0 §9): a header byte n in 129..255 repeats the
    next byte 257-n times; n in 0..127 copies n+1 literals. One strip
    (RowsPerStrip=3), encoded by hand as
      FD AA            -> 257-0xFD = 4 copies of AA      (row 0)
      07 10 20 30 40   -> 8 literals                     (rows 1-2)
         55 55 66 77
    = 11 strip bytes at file offset 8 (one pad byte keeps the IFD on a
    word boundary at offset 20, spec §2). IFD values are left-justified
    in their 4-byte slots regardless of byte order (spec §2 "Value
    offset... left-justified")."""
    t = bytearray(b"MM\x00*")
    t += struct.pack(">I", 20)  # IFD offset
    t += bytes([0xFD, 0xAA, 0x07, 0x10, 0x20, 0x30, 0x40,
                0x55, 0x55, 0x66, 0x77])
    t += b"\x00"  # pad to word boundary

    def ent(tag, ftype, count, vbytes):
        return struct.pack(">HHI", tag, ftype, count) + vbytes

    short = lambda v: struct.pack(">H", v) + b"\x00\x00"
    long_ = lambda v: struct.pack(">I", v)
    entries = (
        ent(256, 3, 1, short(4))        # ImageWidth
        + ent(257, 3, 1, short(3))      # ImageLength
        + ent(258, 3, 1, short(8))      # BitsPerSample
        + ent(259, 3, 1, short(32773))  # Compression = PackBits
        + ent(262, 3, 1, short(1))      # Photometric = BlackIsZero
        + ent(273, 4, 1, long_(8))      # StripOffsets
        + ent(277, 3, 1, short(1))      # SamplesPerPixel
        + ent(278, 3, 1, short(3))      # RowsPerStrip
        + ent(279, 4, 1, long_(11))     # StripByteCounts
    )
    t += struct.pack(">H", 9) + entries + struct.pack(">I", 0)

    px = decode_tiff(bytes(t))
    grey = np.array([[0xAA, 0xAA, 0xAA, 0xAA],
                     [0x10, 0x20, 0x30, 0x40],
                     [0x55, 0x55, 0x66, 0x77]], dtype=np.uint8)
    assert px.shape == (3, 4, 3)
    assert (px == grey[:, :, None]).all()


def test_decode_handwritten_tiff_lzw_predictor():
    """2x2 RGB TIFF, II (little-endian), LZW + horizontal predictor.

    Display pixels: row0 = (100,150,200) (110,160,210),
    row1 = (50,60,70) (40,50,60). Predictor 2 stores per-row per-sample
    deltas mod 256 (spec §14), so the bytes under LZW are
      100 150 200  10  10  10     (110-100, 160-150, 210-200)
       50  60  70 246 246 246     (40-50 = -10 = 246 mod 256)
    TIFF LZW (spec §13): MSB-first 9-bit codes, Clear=256, EOI=257.
    Greedy encoding trace (all codes stay 9-bit):
      256 Clear
      100 (add [100,150]=258)   150 (add [150,200]=259)
      200 (add [200,10]=260)     10 (add [10,10]=261)
      261 = [10,10]             (add [10,10,50]=262)
       50 (add [50,60]=263)      60 (add [60,70]=264)
       70 (add [70,246]=265)    246 (add [246,246]=266)
      266 = [246,246]
      257 EOI
    12 codes x 9 bits = 108 bits, MSB-first, zero-padded to 14 bytes:
      100000000 001100100 010010110 011001000 000001010 100000101
      000110010 000111100 001000110 011110110 100001010 100000001
    -> 80 19 12 CC 80 54 14 64 3C 23 3D A1 50 10."""
    lzw = bytes([0x80, 0x19, 0x12, 0xCC, 0x80, 0x54, 0x14,
                 0x64, 0x3C, 0x23, 0x3D, 0xA1, 0x50, 0x10])
    t = bytearray(b"II*\x00")
    t += struct.pack("<I", 22)  # IFD offset: 8 + 14 strip bytes
    t += lzw

    def ent(tag, ftype, count, vbytes):
        return struct.pack("<HHI", tag, ftype, count) + vbytes

    short = lambda v: struct.pack("<H", v) + b"\x00\x00"
    long_ = lambda v: struct.pack("<I", v)
    # 10 entries -> IFD spans 22 .. 22+2+120+4 = 148; the out-of-line
    # BitsPerSample triple (6 bytes > the 4-byte slot) lives at 148
    entries = (
        ent(256, 3, 1, short(2))        # ImageWidth
        + ent(257, 3, 1, short(2))      # ImageLength
        + ent(258, 3, 3, long_(148))    # BitsPerSample -> offset 148
        + ent(259, 3, 1, short(5))      # Compression = LZW
        + ent(262, 3, 1, short(2))      # Photometric = RGB
        + ent(273, 4, 1, long_(8))      # StripOffsets
        + ent(277, 3, 1, short(3))      # SamplesPerPixel
        + ent(278, 3, 1, short(2))      # RowsPerStrip
        + ent(279, 4, 1, long_(14))     # StripByteCounts
        + ent(317, 3, 1, short(2))      # Predictor = horizontal
    )
    t += struct.pack("<H", 10) + entries + struct.pack("<I", 0)
    t += struct.pack("<3H", 8, 8, 8)  # BitsPerSample values

    px = decode_tiff(bytes(t))
    want = np.array([[[100, 150, 200], [110, 160, 210]],
                     [[50, 60, 70], [40, 50, 60]]], dtype=np.uint8)
    assert px.shape == (2, 2, 3)
    assert (px == want).all()


def test_decode_handwritten_tiff_4bit_gray():
    """3x3 4-bit grayscale TIFF, II (little-endian), uncompressed —
    the sub-byte scanned-archive shape, packed by hand.

    Samples (0..15): row0 = 1 2 3, row1 = 15 0 7, row2 = 4 10 5.
    Spec §3: samples pack MSB-first within each byte and every row
    begins on a byte boundary, so stride = ceil(3*4/8) = 2 bytes with
    4 pad bits per row:
      row0: 0x12 0x30   row1: 0xF0 0x70   row2: 0x4A 0x50
    Decode scales x17 (max sample 15 -> 255): 17 34 51 / 255 0 119 /
    68 170 85, broadcast to RGB."""
    t = bytearray(b"II*\x00")
    t += struct.pack("<I", 14)  # IFD offset: 8 + 6 strip bytes
    t += bytes([0x12, 0x30, 0xF0, 0x70, 0x4A, 0x50])

    def ent(tag, ftype, count, vbytes):
        return struct.pack("<HHI", tag, ftype, count) + vbytes

    short = lambda v: struct.pack("<H", v) + b"\x00\x00"
    long_ = lambda v: struct.pack("<I", v)
    entries = (
        ent(256, 3, 1, short(3))      # ImageWidth
        + ent(257, 3, 1, short(3))    # ImageLength
        + ent(258, 3, 1, short(4))    # BitsPerSample = 4
        + ent(259, 3, 1, short(1))    # Compression = none
        + ent(262, 3, 1, short(1))    # Photometric = BlackIsZero
        + ent(273, 4, 1, long_(8))    # StripOffsets
        + ent(277, 3, 1, short(1))    # SamplesPerPixel
        + ent(278, 3, 1, short(3))    # RowsPerStrip
        + ent(279, 4, 1, long_(6))    # StripByteCounts
    )
    t += struct.pack("<H", 9) + entries + struct.pack("<I", 0)

    px = decode_tiff(bytes(t))
    grey = np.array([[17, 34, 51], [255, 0, 119], [68, 170, 85]],
                    dtype=np.uint8)
    assert px.shape == (3, 3, 3)
    assert (px == grey[:, :, None]).all()


def test_tiff_lzw_early_change_boundary():
    """Pin the TIFF LZW early-change rule across the 9->10 and 10->11
    bit boundaries against an INDEPENDENT packer. The in-repo encoder
    never exercises a wrong rule against the decoder (matched pair), so
    this packer emits ROOT CODES ONLY — a valid if unoptimized LZW
    stream (TIFF 6.0 s13 puts no lower bound on match length) — and
    widens exactly when the decoder's table size reaches 2^width - 1
    (511/1023), i.e. libtiff's rule. A decoder 'fixed' to widen at
    510/1022 (the off-by-one the old docstring implied) desynchronizes
    the bit stream at code 254 and fails loudly here."""
    from victorialogs_spark.datapipe.tiff import _lzw_decode_tiff

    rng = np.random.RandomState(14)
    raw = bytes(rng.randint(0, 256, 900, dtype=np.uint8).tolist())

    codes = [(256, 9)]  # leading Clear at 9 bits
    table_len, width = 258, 9
    for i, b in enumerate(raw):
        codes.append((b, width))
        if i > 0:  # decoder appends one entry per code after the first
            table_len += 1
            if table_len == (1 << width) - 1:
                width += 1
    codes.append((257, width))  # EOI

    # crossings actually happen inside this stream
    widths = {w for _, w in codes}
    assert widths == {9, 10, 11}

    acc = nbits = 0
    out = bytearray()
    for code, w in codes:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)

    assert _lzw_decode_tiff(bytes(out), len(raw)) == raw


# ---------------------------------------------------------------------------
# WebP-VP8L fixtures: bitstreams packed by hand with an independent
# little bit-packer (LSB-first fields, MSB-first prefix codes), NOT
# webp.py's writer — pinning header layout, simple-code parsing (1-bit
# and 8-bit first symbols, canonical 2-symbol order), zero-bit
# single-symbol codes, the code-length-code bootstrap with 18-runs,
# LZ77 2D distance codes 1 (above) and 2 (left), the color cache, and
# the subtract-green transform header + inverse.


class _VP8LBits:
    """Independent LSB-first bit packer for hand-assembled fixtures."""

    def __init__(self):
        self.out = bytearray()
        self.n = 0

    def f(self, value, width):  # fixed-width field, LSB-first
        for i in range(width):
            if self.n % 8 == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << (self.n % 8)
            self.n += 1

    def c(self, code, length):  # prefix code, MSB-first
        for i in range(length - 1, -1, -1):
            self.f((code >> i) & 1, 1)

    def riff(self):
        body = b"\x2f" + bytes(self.out)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_decode_handwritten_vp8l_simple_codes():
    """2x2 literal VP8L image, all five prefix codes in the simple form.

    Pixels (R,G,B): row0 = (10,20,30) (10,200,30); row1 = (40,20,77)
    (40,200,77). Greens are written in DESCENDING order (s0=200, s1=20)
    to pin the canonical rule: code 0 still belongs to the SMALLER
    symbol (20), whatever the written order — a decoder that assigns
    code 0 to the first-written symbol swaps every green."""
    from victorialogs_spark.datapipe.webp import decode_vp8l

    b = _VP8LBits()
    b.f(1, 14)   # width-1
    b.f(1, 14)   # height-1
    b.f(0, 1)    # alpha hint
    b.f(0, 3)    # version
    b.f(0, 1)    # no transforms
    b.f(0, 1)    # no color cache
    b.f(0, 1)    # no meta-prefix image
    # GREEN: simple, 2 symbols, 8-bit first, s0=200, s1=20
    b.f(1, 1); b.f(1, 1); b.f(1, 1); b.f(200, 8); b.f(20, 8)
    # RED: simple, 2 symbols, 8-bit first, s0=10, s1=40 -> 10:0, 40:1
    b.f(1, 1); b.f(1, 1); b.f(1, 1); b.f(10, 8); b.f(40, 8)
    # BLUE: simple, 2 symbols, s0=30, s1=77 -> 30:0, 77:1
    b.f(1, 1); b.f(1, 1); b.f(1, 1); b.f(30, 8); b.f(77, 8)
    # ALPHA: simple, 1 symbol (255) -> zero-bit code
    b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(255, 8)
    # DISTANCE (unused but mandatory): simple, 1 symbol (0), 1-bit form
    b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(0, 1)
    # pixels: per literal g, r, b codes (alpha costs no bits)
    b.c(0, 1); b.c(0, 1); b.c(0, 1)  # (10,20,30)
    b.c(1, 1); b.c(0, 1); b.c(0, 1)  # (10,200,30)
    b.c(0, 1); b.c(1, 1); b.c(1, 1)  # (40,20,77)
    b.c(1, 1); b.c(1, 1); b.c(1, 1)  # (40,200,77)
    px = decode_vp8l(b.riff())
    want = np.array(
        [[[10, 20, 30], [10, 200, 30]], [[40, 20, 77], [40, 200, 77]]],
        dtype=np.uint8,
    )
    assert px.shape == (2, 2, 3)
    assert (px == want).all()


def test_decode_handwritten_vp8l_backref_cache():
    """3x2 VP8L with a normal green code, LZ77 back-references through
    the 2D distance map, and a 1-bit color cache.

    A = (40,200,77) -> cache slot 0; B = (1,2,3) -> slot 1
    (key = (0x1e35a7bd * 0xff28c84d) >> 31 = 0; 0xff010203 -> 1).
    Program: p0 = literal A; p1 = literal B;
    p2 = backref len 1, distance code 2 = (dx 1, dy 0) = left -> B;
    p3 = backref len 2, distance code 1 = (dx 0, dy 1) = above,
         dist = xsize = 3 -> copies p0, p1 -> A, B;
    p5 = cache hit, slot 1 -> B.
    Expected rows: [A, B, B], [A, B, B].

    Green alphabet = 256 + 24 + 2 = 282; used symbols
    {2: B.g, 200: A.g, 256: len-1, 257: len-2, 281: cache slot 1}.
    Lengths: sym 2 -> 1 bit; the other four -> 3 bits
    (Kraft 1/2 + 4/8 = 1). Canonical: 2:'0'; ascending 3-bit codes
    200:'100', 256:'101', 257:'110', 281:'111'.
    Code-length code: symbols {0,1,3,18} all 2 bits ->
    0:'00', 1:'01', 3:'10', 18:'11'. Slot ops for lengths[0..281]:
    0,0, 1@2, 0,0, 18-run 138 (extra 127), 18-run 46+11=57 zeros
    (extra 46), 3@200, 18-run 55 (extra 44), 3@256, 3@257,
    18-run 23 (extra 12), 3@281 = 282 slots in 13 ops."""
    from victorialogs_spark.datapipe.webp import decode_vp8l

    b = _VP8LBits()
    b.f(2, 14)   # width-1
    b.f(1, 14)   # height-1
    b.f(0, 1); b.f(0, 3)
    b.f(0, 1)    # no transforms
    b.f(1, 1); b.f(1, 4)   # color cache, 1 bit (2 slots)
    b.f(0, 1)    # no meta-prefix image
    # GREEN: normal form
    b.f(0, 1)            # not simple
    b.f(2, 4)            # num_code_lengths = 6: order 17,18,0,1,2,3
    b.f(0, 3)            # cl length of 17
    b.f(2, 3)            # 18
    b.f(2, 3)            # 0
    b.f(2, 3)            # 1
    b.f(0, 3)            # 2
    b.f(2, 3)            # 3
    b.f(0, 1)            # no max_symbol cap (read to alphabet end)
    b.c(0b00, 2); b.c(0b00, 2)        # slots 0,1 = 0
    b.c(0b01, 2)                      # slot 2: length 1
    b.c(0b00, 2); b.c(0b00, 2)        # slots 3,4 = 0
    b.c(0b11, 2); b.f(127, 7)         # 18-run: 11+127 = 138 zeros (5..142)
    b.c(0b11, 2); b.f(46, 7)          # 18-run: 11+46 = 57 zeros (143..199)
    b.c(0b10, 2)                      # slot 200: length 3
    b.c(0b11, 2); b.f(44, 7)          # 18-run: 55 zeros (201..255)
    b.c(0b10, 2)                      # slot 256: length 3
    b.c(0b10, 2)                      # slot 257: length 3
    b.c(0b11, 2); b.f(12, 7)          # 18-run: 23 zeros (258..280)
    b.c(0b10, 2)                      # slot 281: length 3
    # RED: simple, s0=1 (1-bit form), s1=40 -> 1:'0', 40:'1'
    b.f(1, 1); b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(40, 8)
    # BLUE: simple, s0=3, s1=77 -> 3:'0', 77:'1'
    b.f(1, 1); b.f(1, 1); b.f(1, 1); b.f(3, 8); b.f(77, 8)
    # ALPHA: simple single 255 -> zero-bit
    b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(255, 8)
    # DISTANCE: simple, s0=0, s1=1 -> 0:'0', 1:'1'
    b.f(1, 1); b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(1, 8)
    # data:
    b.c(0b100, 3)             # green 200 -> literal A
    b.c(1, 1)                 # red 40
    b.c(1, 1)                 # blue 77 (alpha 0 bits) -> cache slot 0
    b.c(0, 1)                 # green 2 -> literal B
    b.c(0, 1)                 # red 1
    b.c(0, 1)                 # blue 3 -> cache slot 1
    b.c(0b101, 3)             # green 256: length code 0 -> length 1
    b.c(1, 1)                 # distance symbol 1 -> value 2 -> left
    b.c(0b110, 3)             # green 257: length code 1 -> length 2
    b.c(0, 1)                 # distance symbol 0 -> value 1 -> above
    b.c(0b111, 3)             # green 281: cache slot 1 -> B
    px = decode_vp8l(b.riff())
    A, B = [40, 200, 77], [1, 2, 3]
    want = np.array([[A, B, B], [A, B, B]], dtype=np.uint8)
    assert px.shape == (2, 3, 3)
    assert (px == want).all()


def test_decode_handwritten_vp8l_subtract_green():
    """2x1 VP8L with the subtract-green transform: header type bits and
    the inverse (r += g, b += g mod 256), wrap-around included.

    Display pixels: (10,3,200), (0,255,8). Coded residuals:
    (7,3,197), (1,255,9) — e.g. 0-255 = 1 mod 256."""
    from victorialogs_spark.datapipe.webp import decode_vp8l

    b = _VP8LBits()
    b.f(1, 14)   # width-1 = 1 (2 wide)
    b.f(0, 14)   # height-1 = 0
    b.f(0, 1); b.f(0, 3)
    b.f(1, 1); b.f(2, 2)   # transform present: type 2 = subtract green
    b.f(0, 1)              # no more transforms
    b.f(0, 1)              # no color cache
    b.f(0, 1)              # no meta
    # GREEN: simple 2 symbols {3, 255} -> 3:'0', 255:'1'
    b.f(1, 1); b.f(1, 1); b.f(1, 1); b.f(3, 8); b.f(255, 8)
    # RED (residuals): {7, 1} written descending -> canonical 1:'0', 7:'1'
    b.f(1, 1); b.f(1, 1); b.f(1, 1); b.f(7, 8); b.f(1, 8)
    # BLUE (residuals): {197, 9} -> 9:'0', 197:'1'
    b.f(1, 1); b.f(1, 1); b.f(1, 1); b.f(197, 8); b.f(9, 8)
    # ALPHA: single 255
    b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(255, 8)
    # DISTANCE: single 0
    b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(0, 1)
    # residual pixels: (7,3,197) then (1,255,9)
    b.c(0, 1)  # green 3
    b.c(1, 1)  # red 7
    b.c(1, 1)  # blue 197
    b.c(1, 1)  # green 255
    b.c(0, 1)  # red 1
    b.c(0, 1)  # blue 9
    px = decode_vp8l(b.riff())
    want = np.array([[[10, 3, 200], [0, 255, 8]]], dtype=np.uint8)
    assert px.shape == (1, 2, 3)
    assert (px == want).all()


def test_decode_handwritten_vp8l_meta_prefix_groups():
    """8x1 VP8L with TWO meta-prefix groups selected by a recursively
    coded 2x1 entropy image (meta_bits=2: pixels 0-3 are block 0,
    4-7 block 1; group index = (red << 8) | green of the entropy-image
    pixel). Every main-image prefix code is a single-symbol (zero-bit)
    code, so the data section costs NO bits and the decoded pixels
    depend entirely on group selection: block 0 -> (20,10,30),
    block 1 -> (60,50,70). A decoder that botches the entropy-image
    recursion, the (r<<8)|g index, or the (y>>bits)*ew + (x>>bits)
    lookup paints the wrong half."""
    from victorialogs_spark.datapipe.webp import decode_vp8l

    b = _VP8LBits()
    b.f(7, 14)   # width-1 = 7
    b.f(0, 14)   # height-1 = 0
    b.f(0, 1); b.f(0, 3)
    b.f(0, 1)    # no transforms
    b.f(0, 1)    # no color cache
    b.f(1, 1)    # meta-prefix image present
    b.f(0, 3)    # meta_bits - 2 = 0 -> blocks of 4 -> entropy image 2x1
    # --- entropy sub-image (2x1, level > 0: no transforms, no meta) ---
    b.f(0, 1)    # sub-image: no color cache
    # sub GREEN: simple 2 symbols, 1-bit first: s0=0, s1=1 -> 0:'0', 1:'1'
    b.f(1, 1); b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(1, 8)
    # sub RED: single 0 (group indices < 256 need red = 0)
    b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(0, 1)
    # sub BLUE: single 0
    b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(0, 1)
    # sub ALPHA: single 0
    b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(0, 1)
    # sub DISTANCE: single 0
    b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(0, 1)
    # sub pixels: green 0 (group 0), green 1 (group 1)
    b.c(0, 1); b.c(1, 1)
    # --- two groups x five codes, all single-symbol (zero data bits) ---
    for g, r, bl in ((10, 20, 30), (50, 60, 70)):
        b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(g, 8)    # green
        b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(r, 8)    # red
        b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(bl, 8)   # blue
        b.f(1, 1); b.f(0, 1); b.f(1, 1); b.f(255, 8)  # alpha
        b.f(1, 1); b.f(0, 1); b.f(0, 1); b.f(0, 1)    # distance
    # data: 8 pixels, all codes zero-bit
    px = decode_vp8l(b.riff())
    want = np.array([[[20, 10, 30]] * 4 + [[60, 50, 70]] * 4], np.uint8)
    assert px.shape == (1, 8, 3)
    assert (px == want).all()


def test_vp8l_decode_guards_adversarial_dimensions():
    """A few-byte crafted stream claiming 16384x16384 must raise the
    loud ValueError boundary BEFORE allocating a 268M-entry output
    (r15 advice: untrusted-corpus resource guard), for both still
    decode and the animation canvas."""
    import pytest

    from victorialogs_spark.datapipe.webp import (
        WEBP_MAX_PIXELS,
        decode_vp8l,
        decode_webp_frames,
    )

    b = _VP8LBits()
    b.f(16383, 14)  # width-1 = 16383
    b.f(16383, 14)  # height-1
    b.f(0, 1)
    b.f(0, 3)
    with pytest.raises(ValueError, match="pixel"):
        decode_vp8l(b.riff())

    # VP8X canvas guard: animation header claiming a 2^24-square canvas
    vp8x_body = bytes([0x02, 0, 0, 0]) + b"\xff\xff\xff" + b"\xff\xff\xff"
    chunk = b"VP8X" + struct.pack("<I", len(vp8x_body)) + vp8x_body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="pixel"):
        decode_webp_frames(payload)

    assert WEBP_MAX_PIXELS >= 4096 * 4096  # real crawled images decode


def test_mp4_sample_table_guards_adversarial_counts():
    """Ninth-pass resource guard (the VP8L guard class): a few-byte
    crafted sample table claiming billions of entries must raise the
    loud ValueError BEFORE expanding ([delta] * count) into a
    multi-GB list."""
    import pytest

    from victorialogs_spark.datapipe.mp4 import MP4_MAX_SAMPLES, build_mp4, parse_mp4

    base = build_mp4([b"AA", b"BB", b"CC"], [10, 10, 10])
    # a real file still parses
    assert len(parse_mp4(base)["tracks"][0]["samples"]) == 3

    # craft: one stts run claiming 2^31 samples (count field patched)
    stts_sig = b"stts" + b"\x00\x00\x00\x00" + struct.pack(">I", 1)
    i = base.find(stts_sig)
    assert i != -1
    patched = (
        base[: i + 12] + struct.pack(">I", 1 << 31) + base[i + 16 :]
    )
    with pytest.raises(ValueError, match="guard"):
        parse_mp4(patched)

    # stsz uniform-size path: sample count patched past the cap
    stsz_i = base.find(b"stsz")
    assert stsz_i != -1
    # stsz payload: version/flags(4) + uniform(4) + count(4)
    p = stsz_i + 4 + 4
    patched2 = base[:p] + struct.pack(">II", 7, 1 << 31) + base[p + 8 :]
    with pytest.raises(ValueError, match="guard"):
        parse_mp4(patched2)

    assert MP4_MAX_SAMPLES >= (1 << 20)  # hours of real video still parse


def test_all_codecs_guard_adversarial_dimensions():
    """The VP8L guard class, applied to every in-repo decoder: a
    crafted header declaring multi-gigapixel dimensions must raise the
    loud ValueError BEFORE any canvas/LZW/inflate allocation
    (r15 review — gif/tiff/png/jpeg had no cap)."""
    import struct as _struct
    import zlib

    import pytest

    from victorialogs_spark.datapipe.gif import GIF_MAX_PIXELS, decode_gif_frames
    from victorialogs_spark.datapipe.jpeg import JPEG_MAX_PIXELS, decode_jpeg
    from victorialogs_spark.datapipe.multimodal import PNG_MAX_PIXELS, _decode_png
    from victorialogs_spark.datapipe.tiff import TIFF_MAX_PIXELS, decode_tiff

    # real crawled images must still decode
    for cap in (GIF_MAX_PIXELS, JPEG_MAX_PIXELS, PNG_MAX_PIXELS, TIFF_MAX_PIXELS):
        assert cap >= 4096 * 4096

    # GIF: u16 logical screen 65535x65535
    gif = b"GIF89a" + _struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
    with pytest.raises(ValueError, match="pixel"):
        decode_gif_frames(gif + b";")

    # JPEG: SOF0 declaring 65535x65535
    sof = b"\x08" + _struct.pack(">HH", 65535, 65535) + b"\x01" + bytes([1, 0x11, 0])
    jpg = (b"\xff\xd8" + b"\xff\xc0" + _struct.pack(">H", len(sof) + 2) + sof
           + b"\xff\xd9")
    with pytest.raises(ValueError, match="pixel"):
        decode_jpeg(jpg)

    # TIFF: u32 dims in a minimal IFD
    def ifd_entry(tag, val):
        return _struct.pack("<HHI", tag, 4, 1) + _struct.pack("<I", val)

    entries = (ifd_entry(256, 2**20) + ifd_entry(257, 2**20)
               + ifd_entry(262, 1))
    tif = (b"II*\x00" + _struct.pack("<I", 8)
           + _struct.pack("<H", 3) + entries + _struct.pack("<I", 0))
    with pytest.raises(ValueError, match="pixel"):
        decode_tiff(tif)

    # PNG: u32 dims in IHDR
    ihdr = _struct.pack(">IIBBBBB", 2**16, 2**16, 8, 2, 0, 0, 0)
    def chunk(t, d):
        c = zlib.crc32(t + d) & 0xFFFFFFFF
        return _struct.pack(">I", len(d)) + t + d + _struct.pack(">I", c)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\0")) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="pixel"):
        _decode_png(png)

    # PNG inflate bomb with SMALL declared dims: 2x2 image whose IDAT
    # inflates to 10MB must hit the bounded-inflate guard
    ihdr = _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\0" * (10 * 1024 * 1024))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates"):
        _decode_png(png)
