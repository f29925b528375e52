"""Package the reference's static element-embedding tables as one npz asset.

The reference ships ~17k LoC of literal python lists
(ref: adsorbdiff/models/embeddings/{khot,qmof_khot,continuous}_embeddings.py)
— published element-property data (CGCNN k-hot vectors, QMOF k-hot vectors,
continuous CGCNN-style properties).  This script reads those tables as DATA
(no code is reused) and emits `adsorbdiff_tpu/assets/element_embeddings.npz`
holding Z-indexed dense matrices; `models/embeddings.py` exposes them with
the reference's dict API.

Run (requires the reference checkout):
    python scripts/gen_embedding_tables.py /root/reference
"""
import runpy
import sys

import numpy as np


def table_to_matrix(table: dict, fill=np.nan) -> np.ndarray:
    zmax = max(table)
    width = len(next(iter(table.values())))
    out = np.full((zmax + 1, width), fill, dtype=np.float32)
    for z, row in table.items():
        if len(row) != width:
            raise ValueError(f"ragged table row Z={z}: {len(row)} != {width}")
        out[z] = row
    return out


def main(ref_root: str) -> None:
    base = f"{ref_root}/adsorbdiff/models/embeddings"
    khot = runpy.run_path(f"{base}/khot_embeddings.py")["KHOT_EMBEDDINGS"]
    qmof = runpy.run_path(f"{base}/qmof_khot_embeddings.py")["QMOF_KHOT_EMBEDDINGS"]
    cont = runpy.run_path(f"{base}/continuous_embeddings.py")["CONTINUOUS_EMBEDDINGS"]

    arrays = {
        # k-hot tables have no missing entries; 0 is the natural fill.
        "khot": table_to_matrix(khot, fill=0.0),
        "qmof_khot": table_to_matrix(qmof, fill=0.0),
        # the continuous table stores NaN for unavailable properties already.
        "continuous": table_to_matrix(cont, fill=np.nan),
        "khot_z": np.array(sorted(khot), dtype=np.int32),
        "qmof_khot_z": np.array(sorted(qmof), dtype=np.int32),
        "continuous_z": np.array(sorted(cont), dtype=np.int32),
    }
    out = "adsorbdiff_tpu/assets/element_embeddings.npz"
    np.savez_compressed(out, **arrays)
    for k, v in arrays.items():
        print(k, v.shape, v.dtype)
    print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
