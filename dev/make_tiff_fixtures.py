#!/usr/bin/env python3
"""Generate compressed/tiled GeoTIFF fixtures for GeoTiffCodecSpec.

INDEPENDENT implementation (pure stdlib python: struct + zlib + a
from-the-spec LZW/PackBits encoder) so the Scala reader is checked
against a second codebase, not just its own writer. Deterministic
values; committed under src/test/resources/geotiff/.

TIFF layout: classic little-endian, chunky, single band.
"""
import struct, zlib, os, sys

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "geotiff")


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first, Clear=256, EOI=257, 9->12 bits with
    early change (width grows when next free slot == 2^w - 1), table
    reset at 4094 (libtiff convention)."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    bits = 9

    def put(code):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << bits) | code
        bitcnt += bits
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    table = {}
    next_code = 258

    def reset():
        nonlocal table, next_code, bits
        table = {}
        next_code = 258
        bits = 9

    put(256)  # leading Clear
    w = -1
    for byte in data:
        if w < 0:
            w = byte
            continue
        key = (w << 8) | byte
        if key in table:
            w = table[key]
        else:
            put(w)
            table[key] = next_code
            next_code += 1
            if next_code == (1 << bits) - 1 and bits < 12:
                bits += 1
            if next_code == 4094:
                put(256)
                reset()
            w = byte
    if w >= 0:
        put(w)
    put(257)  # EOI
    if bitcnt > 0:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def packbits_encode(data: bytes, row_bytes: int) -> bytes:
    out = bytearray()
    for r0 in range(0, len(data), row_bytes):
        row = data[r0:r0 + row_bytes]
        i = 0
        while i < len(row):
            run = 1
            while i + run < len(row) and run < 128 and row[i + run] == row[i]:
                run += 1
            if run >= 3:
                out.append((1 - run) & 0xFF)
                out.append(row[i])
                i += run
            else:
                j = i
                lit = 0
                while j < len(row) and lit < 128:
                    r = 1
                    while j + r < len(row) and r < 3 and row[j + r] == row[j]:
                        r += 1
                    if r >= 3:
                        break
                    j += 1
                    lit += 1
                out.append(lit - 1)
                out += row[i:i + lit]
                i += lit
    return bytes(out)


def hdiff(data: bytearray, w: int, h: int, bytes_per: int) -> bytes:
    """Apply horizontal differencing (predictor 2), little-endian."""
    out = bytearray(data)
    for r in range(h):
        base = r * w * bytes_per
        for c in range(w - 1, 0, -1):
            at = base + c * bytes_per
            prev = base + (c - 1) * bytes_per
            if bytes_per == 1:
                out[at] = (out[at] - out[prev]) & 0xFF
            elif bytes_per == 2:
                cur = out[at] | (out[at + 1] << 8)
                pv = out[prev] | (out[prev + 1] << 8)
                d = (cur - pv) & 0xFFFF
                out[at] = d & 0xFF
                out[at + 1] = d >> 8
    return bytes(out)


def fpdiff(data: bytearray, w: int, h: int, bytes_per: int) -> bytes:
    """Apply the TechNote-3 floating-point predictor (3): per row,
    byte-plane split (MSB plane first, regardless of file byte order —
    little-endian raw bytes reverse) then byte-wise differencing."""
    out = bytearray(len(data))
    row_bytes = w * bytes_per
    for r in range(h):
        base = r * row_bytes
        for s in range(w):
            for b in range(bytes_per):
                out[base + b * w + s] = \
                    data[base + s * bytes_per + (bytes_per - 1 - b)]
        for i in range(row_bytes - 1, 0, -1):
            out[base + i] = (out[base + i] - out[base + i - 1]) & 0xFF
    return bytes(out)


def write_tiff(path, width, height, raw, bits, sample_format, bytes_per,
               compression, predictor=1, rows_per_strip=None, tile=None,
               origin=(0.0, 0.0), scale=(1.0, 1.0), planes=None, big=False):
    """planes: list of per-band raw buffers -> planar (separated) layout
    (band-major chunk order); raw is ignored then.
    big: BigTIFF (magic 43, 8-byte offsets, 20-byte entries; strip
    offset/count arrays written as LONG8 to exercise type 16)."""
    row_bytes = width * bytes_per
    chunks = []  # (data, w, h)
    if planes is not None:
        rps = rows_per_strip or height
        for praw in planes:
            for r0 in range(0, height, rps):
                n = min(rps, height - r0)
                chunks.append((praw[r0 * row_bytes:(r0 + n) * row_bytes],
                               width, n))
    elif tile:
        tw, th = tile
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        for tr in range(down):
            for tc in range(across):
                d = bytearray(tw * th * bytes_per)
                copy_rows = min(th, height - tr * th)
                copy_cols = min(tw, width - tc * tw)
                for r in range(copy_rows):
                    src = ((tr * th + r) * width + tc * tw) * bytes_per
                    dst = r * tw * bytes_per
                    d[dst:dst + copy_cols * bytes_per] = \
                        raw[src:src + copy_cols * bytes_per]
                chunks.append((bytes(d), tw, th))
    else:
        rps = rows_per_strip or height
        for r0 in range(0, height, rps):
            n = min(rps, height - r0)
            chunks.append((raw[r0 * row_bytes:(r0 + n) * row_bytes],
                           width, n))

    encoded = []
    for d, cw, chh in chunks:
        if predictor == 2:
            d = hdiff(bytearray(d), cw, chh, bytes_per)
        elif predictor == 3:
            d = fpdiff(bytearray(d), cw, chh, bytes_per)
        if compression == 1:
            e = d
        elif compression == 5:
            e = lzw_encode(d)
        elif compression == 8:
            e = zlib.compress(d)
        elif compression == 32773:
            e = packbits_encode(d, cw * bytes_per)
        else:
            raise ValueError(compression)
        encoded.append(e)

    n = len(encoded)
    data_off = 16 if big else 8
    arr_entry = 8 if big else 4       # LONG8 vs LONG array elements
    off_typ = 16 if big else 4
    offs = []
    p = data_off
    for e in encoded:
        offs.append(p)
        p += len(e)
    off_arr = p
    cnt_arr = off_arr + (arr_entry * n if n > 1 else 0)
    scale_off = cnt_arr + (arr_entry * n if n > 1 else 0)
    tie_off = scale_off + 24
    ifd_off = tie_off + 48

    tags = []  # (tag, type, count, value)
    tags.append((256, 4, 1, width))
    tags.append((257, 4, 1, height))
    tags.append((258, 3, 1, bits))
    tags.append((259, 3, 1, compression))
    tags.append((262, 3, 1, 1))
    spp = len(planes) if planes is not None else 1
    if not tile:
        tags.append((273, off_typ, n, offs[0] if n == 1 else off_arr))
        tags.append((277, 3, 1, spp))
        tags.append((278, 4, 1, rows_per_strip or height))
        tags.append((279, off_typ, n,
                     len(encoded[0]) if n == 1 else cnt_arr))
    else:
        tags.append((277, 3, 1, spp))
    if planes is not None:
        tags.append((284, 3, 1, 2))
    if predictor != 1:
        tags.append((317, 3, 1, predictor))
    if tile:
        tags.append((322, 4, 1, tile[0]))
        tags.append((323, 4, 1, tile[1]))
        tags.append((324, off_typ, n, offs[0] if n == 1 else off_arr))
        tags.append((325, off_typ, n,
                     len(encoded[0]) if n == 1 else cnt_arr))
    tags.append((339, 3, 1, sample_format))
    tags.append((33550, 12, 3, scale_off))
    tags.append((33922, 12, 6, tie_off))
    tags.sort()

    buf = bytearray()
    if big:
        buf += b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    else:
        buf += b"II" + struct.pack("<HI", 42, ifd_off)
    for e in encoded:
        buf += e
    if n > 1:
        fmt = "<Q" if big else "<I"
        for o in offs:
            buf += struct.pack(fmt, o)
        for e in encoded:
            buf += struct.pack(fmt, len(e))
    buf += struct.pack("<3d", scale[0], scale[1], 0.0)
    buf += struct.pack("<6d", 0.0, 0.0, 0.0, origin[0], origin[1], 0.0)
    assert len(buf) == ifd_off, (len(buf), ifd_off)
    if big:
        buf += struct.pack("<Q", len(tags))
        for tag, typ, count, value in tags:
            buf += struct.pack("<HHQ", tag, typ, count)
            if typ == 3 and count == 1:
                buf += struct.pack("<H", value) + b"\x00" * 6
            else:
                buf += struct.pack("<Q", value)
        buf += struct.pack("<Q", 0)
    else:
        buf += struct.pack("<H", len(tags))
        for tag, typ, count, value in tags:
            buf += struct.pack("<HHI", tag, typ, count)
            if typ == 3 and count == 1:
                buf += struct.pack("<HH", value, 0)
            else:
                buf += struct.pack("<I", value)
        buf += struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(buf)


def main():
    os.makedirs(OUT, exist_ok=True)

    # 1. deflate + predictor2, uint16, strips of 5, 37x23
    w, h = 37, 23
    vals = [(r * 31 + c * 7) % 1000 for r in range(h) for c in range(w)]
    raw = b"".join(struct.pack("<H", v) for v in vals)
    write_tiff(os.path.join(OUT, "py_deflate_pred2_gray16.tif"), w, h, raw,
               16, 1, 2, compression=8, predictor=2, rows_per_strip=5,
               origin=(10.0, 20.0), scale=(0.5, 0.25))

    # 2. LZW uint8, strips of 7, 41x17 — content repetitive enough to
    # build a real dictionary but varied across rows
    w, h = 41, 17
    vals = [(r * 13 + c * c) % 251 for r in range(h) for c in range(w)]
    raw = bytes(vals)
    write_tiff(os.path.join(OUT, "py_lzw_gray8.tif"), w, h, raw,
               8, 1, 1, compression=5, rows_per_strip=7,
               origin=(-5.0, 5.0), scale=(1.0, 1.0))

    # 3. PackBits uint8 with long runs, strips of 4, 33x9
    w, h = 33, 9
    vals = [(c // 9 * 40 + r) % 256 for r in range(h) for c in range(w)]
    raw = bytes(vals)
    write_tiff(os.path.join(OUT, "py_packbits_gray8.tif"), w, h, raw,
               8, 1, 1, compression=32773, rows_per_strip=4,
               origin=(0.0, 9.0), scale=(1.0, 1.0))

    # 4. tiled (16x16) deflate float32, 40x24 — edge tiles padded
    w, h = 40, 24
    fvals = [((r * w + c) % 97) / 8.0 for r in range(h) for c in range(w)]
    raw = b"".join(struct.pack("<f", v) for v in fvals)
    write_tiff(os.path.join(OUT, "py_tiled_deflate_f32.tif"), w, h, raw,
               32, 3, 4, compression=8, tile=(16, 16),
               origin=(100.0, 200.0), scale=(2.0, 2.0))

    # 5. big LZW uint8 — forces 10/11/12-bit codes AND a mid-stream
    # table reset (dictionary past 4094): 256x128 pseudo-random bytes
    w, h = 256, 128
    vals = []
    x = 12345
    for i in range(w * h):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        vals.append((x >> 16) & 0xFF)
    raw = bytes(vals)
    write_tiff(os.path.join(OUT, "py_lzw_big.tif"), w, h, raw,
               8, 1, 1, compression=5, rows_per_strip=128,
               origin=(0.0, 128.0), scale=(1.0, 1.0))
    # stash the checksum for the spec
    s = sum(vals)
    print("py_lzw_big sum:", s, "first5:", vals[:5], "last5:", vals[-5:])

    # 6. PLANAR (separated) 2-band uint8, deflate, strips of 6, 21x13 —
    # band-major chunk order per TIFF6 §14
    w, h = 21, 13
    b1 = bytes((r * 7 + c) % 251 for r in range(h) for c in range(w))
    b2 = bytes((r + c * 5) % 251 for r in range(h) for c in range(w))
    write_tiff(os.path.join(OUT, "py_planar2_deflate_gray8.tif"), w, h, b"",
               8, 1, 1, compression=8, rows_per_strip=6,
               origin=(0.0, 13.0), scale=(1.0, 1.0), planes=[b1, b2])

    # 7. BigTIFF (magic 43): deflate uint8, strips of 4, LONG8 strip
    # offset/count arrays (type 16)
    w, h = 19, 11
    vals = bytes((r * 17 + c * 3) % 253 for r in range(h) for c in range(w))
    write_tiff(os.path.join(OUT, "py_bigtiff_deflate_gray8.tif"), w, h, vals,
               8, 1, 1, compression=8, rows_per_strip=4,
               origin=(7.0, 11.0), scale=(1.0, 1.0), big=True)

    # 8. deflate + floating-point predictor 3, float32, strips of 5,
    # 29x14 — dyadic k/8 values are exact in float32
    w, h = 29, 14
    fvals = [((r * w + c) * 11 % 89) / 8.0 for r in range(h) for c in range(w)]
    raw = b"".join(struct.pack("<f", v) for v in fvals)
    write_tiff(os.path.join(OUT, "py_deflate_pred3_f32.tif"), w, h, raw,
               32, 3, 4, compression=8, predictor=3, rows_per_strip=5,
               origin=(3.0, 14.0), scale=(1.0, 1.0))

    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
