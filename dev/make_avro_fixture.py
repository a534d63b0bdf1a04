#!/usr/bin/env python3
"""Hand-rolled Avro Object Container File fixture — written WITHOUT the
avro library (straight from the 1.12 spec: magic, metadata map, 16-byte
sync, deflate blocks, zigzag varints) so graft's reader (built on the
Avro JAVA library) is cross-checked against an independent second
implementation, exactly like the GeoTIFF python fixtures.

Layout: 120 records over 3 blocks, deflate codec, schema
(id long, v double, tag string, opt [null, long])."""
import io, os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "avro")

SCHEMA = ('{"type":"record","name":"r","fields":['
          '{"name":"id","type":"long"},'
          '{"name":"v","type":"double"},'
          '{"name":"tag","type":"string"},'
          '{"name":"opt","type":["null","long"]}]}')


def zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def avro_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return zigzag(len(b)) + b


def record(i: int) -> bytes:
    out = bytearray()
    out += zigzag(i)                                   # id
    out += struct.pack("<d", ((i * 7) % 31) / 4.0)     # v (dyadic, exact)
    out += avro_str("t" + str(i % 5))                  # tag
    if i % 4 == 0:
        out += zigzag(0)                               # union branch null
    else:
        out += zigzag(1) + zigzag(i * 3)               # union branch long
    return bytes(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    sync = bytes(range(16))  # fixed marker: deterministic fixture
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    # file metadata map: count, entries, end-of-map 0
    meta = [("avro.schema", SCHEMA.encode()), ("avro.codec", b"deflate")]
    buf.write(zigzag(len(meta)))
    for k, v in meta:
        buf.write(avro_str(k))
        buf.write(zigzag(len(v)) + v)
    buf.write(zigzag(0))
    buf.write(sync)
    for blk in range(3):
        rows = b"".join(record(i) for i in range(blk * 40, (blk + 1) * 40))
        comp = zlib.compress(rows)[2:-4]  # raw RFC1951: strip zlib wrapper
        buf.write(zigzag(40))
        buf.write(zigzag(len(comp)))
        buf.write(comp)
        buf.write(sync)
    path = os.path.join(OUT, "py_deflate_3blocks.avro")
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    print("wrote", path, os.path.getsize(buf.getvalue()) if False else "")


if __name__ == "__main__":
    main()
