"""Hand-author the 3-vector `.diskann` v2 golden fixture from the layout
spec in `rust_lib/src/file_format.rs:1-125` (+ SQ8 appendix,
`rust_lib/src/index_manager.rs:508-535`) using ONLY struct.pack — no
duckdb_ann_spark imports, so the fixture is independent of our writer.

Run: python tests/make_golden.py  (regenerates tests/fixtures/*.diskann)
"""

import os
import struct

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

# 3 vectors, dim 2, max_degree 2, metric L2, build_complexity 32,
# entry point [0]; adjacency u32::MAX-padded
VECS = [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]
ADJ = [(1, 2), (0, 0xFFFFFFFF), (0, 0xFFFFFFFF)]

def base_bytes() -> bytes:
    out = b"DANN"                                  # magic
    out += struct.pack("<I", 2)                    # version
    out += struct.pack("<I", 3)                    # num_vectors
    out += struct.pack("<I", 2)                    # dimension
    out += struct.pack("<I", 2)                    # max_degree
    out += struct.pack("<I", 1)                    # num_entry_points
    out += struct.pack("<B", 0)                    # metric: 0 = L2
    out += b"\x00\x00\x00"                         # pad[3]
    out += struct.pack("<I", 32)                   # build_complexity
    out += struct.pack("<I", 0)                    # entry point ids
    for v in VECS:
        out += struct.pack("<2f", *v)              # vector segment
    for a in ADJ:
        out += struct.pack("<2I", *a)              # adjacency segment
    return out

def sq8_appendix() -> bytes:
    # per-dim mins/scales over VECS: dim0 in [1,5], dim1 in [2,6]
    # codes = round((v - min) / scale * 255)
    out = b"SQ8\x00"
    out += struct.pack("<I", 2)                    # dimension
    out += struct.pack("<Q", 6)                    # qlen = n * dim
    out += struct.pack("<2f", 1.0, 2.0)            # mins
    out += struct.pack("<2f", 4.0, 4.0)            # scales (max - min)
    out += bytes([0, 0, 128, 128, 255, 255])       # codes u8
    return out

if __name__ == "__main__":
    os.makedirs(HERE, exist_ok=True)
    with open(os.path.join(HERE, "golden_3vec.diskann"), "wb") as f:
        f.write(base_bytes())
    with open(os.path.join(HERE, "golden_3vec_sq8.diskann"), "wb") as f:
        f.write(base_bytes() + sq8_appendix())
    print("wrote", HERE)
