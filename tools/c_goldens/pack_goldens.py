"""Pack the raw golden dumps from gen_goldens.c into one compressed npz."""
import os
import sys

import numpy as np


def main(indir: str, out_npz: str) -> None:
    arrays = {}
    with open(os.path.join(indir, "manifest.txt")) as f:
        for line in f:
            name, dtype, shape = line.split()
            shape = tuple(int(s) for s in shape.split(","))
            np_dtype = {"c8": np.complex64, "c16": np.complex128,
                        "f8": np.float64, "f4": np.float32,
                        "i4": np.int32}[dtype]
            raw = np.fromfile(os.path.join(indir, name + ".bin"),
                              dtype=np_dtype)
            arrays[name] = raw.reshape(shape)
    os.makedirs(os.path.dirname(out_npz), exist_ok=True)
    np.savez_compressed(out_npz, **arrays)
    total = sum(a.nbytes for a in arrays.values())
    print(f"packed {len(arrays)} arrays ({total/1e6:.1f} MB raw) -> {out_npz} "
          f"({os.path.getsize(out_npz)/1e6:.1f} MB)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
