"""Generate tests/fixtures/gemnet_oracle_golden.npz — the GemNet-OC reference
oracle's state_dict + outputs on the fixed parity geometry, so the import
parity test runs without torch (see tests/test_torch_import.py)."""
import os

import numpy as np
import torch

from tests.test_torch_import import GEMNET_GOLDEN, GEMNET_ORACLE_KW, _gemnet_oracle_system
from tests.torch_ref_gemnet import RefGemNetOC


def main() -> None:
    torch.manual_seed(0)
    oracle = RefGemNetOC(**GEMNET_ORACLE_KW)
    oracle.eval()
    pos, z, tags, cell = _gemnet_oracle_system()
    with torch.no_grad():
        ref = oracle(z, pos, cell, tags)
    payload = {f"sd.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    payload.update(
        energy=np.float32(ref["energy"]),
        forces=ref["forces"].numpy().astype(np.float32),
    )
    np.savez_compressed(GEMNET_GOLDEN, **payload)
    print(f"wrote {GEMNET_GOLDEN}: {os.path.getsize(GEMNET_GOLDEN)} bytes")


if __name__ == "__main__":
    main()
