"""Generate tests/fixtures/eqv2_oracle_golden.npz — the EquiformerV2
reference oracle's state_dict + outputs on the fixed parity geometry, so the
import parity test runs without torch or the reference checkout's Jd.pt."""
import numpy as np
import torch

from tests.test_torch_import import EQV2_GOLDEN, EQV2_ORACLE_KW, _gemnet_oracle_system
from tests.torch_ref_eqv2 import RefEquiformerV2


def main() -> None:
    torch.manual_seed(0)
    oracle = RefEquiformerV2(**EQV2_ORACLE_KW)
    oracle.eval()
    pos, z, tags, cell = _gemnet_oracle_system()
    with torch.no_grad():
        f1, f2 = oracle(z, pos, cell, gauge_seed=5)
    payload = {f"sd.{k}": v.float().numpy() for k, v in oracle.state_dict().items()}
    payload.update(f1=f1.float().numpy(), f2=f2.float().numpy())
    np.savez_compressed(EQV2_GOLDEN, **payload)
    print(f"wrote {EQV2_GOLDEN}")


if __name__ == "__main__":
    main()
