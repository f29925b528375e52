"""All three model families drive the SAME trainer/sampler machinery."""
import jax
import numpy as np
import pytest

from adsorbdiff_tpu.train.trainer import DenoisingTrainer, S2EFTrainer
from tests.test_equiformer_v2 import TINY as EQV2_TINY
from tests.test_gemnet_oc import TINY as GEMNET_TINY
from tests.test_s2ef_and_tasks import make_s2ef_dataset, s2ef_config
from tests.test_trainer import config_for, make_dataset

GEMNET_CFG = dict(GEMNET_TINY, name="gemnet_oc", so3_denoising=True)
EQV2_CFG = dict(EQV2_TINY, name="equiformer_v2", so3_denoising=True, for_denoising=True)


@pytest.mark.parametrize("model_cfg", [GEMNET_CFG, EQV2_CFG], ids=["gemnet_oc", "eqv2"])
@pytest.mark.slow
def test_denoising_trainer_with_model_family(tmp_path, rng, model_cfg):
    train = make_dataset(tmp_path, rng, 8, f"train_{model_cfg['name']}")
    cfg = config_for(train, run_dir=str(tmp_path))
    cfg["model"] = dict(model_cfg)
    tr = DenoisingTrainer(cfg, mesh=None)
    first = next(iter(tr.train_batcher))
    tr.init_state(first)
    step_fn = tr._get_step_fn(first)
    losses = []
    for i in range(3):
        tr.state, aux = step_fn(tr.state, first, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    # score prediction path (feeds the sampler)
    o1, o2 = tr.predict_denoising(first)
    assert o1.shape == first.pos.shape and o2 is not None
    # rotation head zeroed on fixed atoms (sampler contract)
    fixed = np.asarray(first.fixed)
    assert np.abs(np.asarray(o2)[fixed]).max() == 0


@pytest.mark.slow
def test_s2ef_trainer_with_gemnet(tmp_path, rng):
    train = make_s2ef_dataset(tmp_path, rng, 8, "gtrain")
    cfg = s2ef_config(train, run_dir=str(tmp_path))
    cfg["model"] = dict(GEMNET_TINY, name="gemnet_oc")
    tr = S2EFTrainer(cfg, mesh=None)
    first = next(iter(tr.train_batcher))
    tr.init_state(first)
    tr.state, aux = tr._get_step_fn(first)(tr.state, first, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    energy, forces = tr.predict(first)
    assert energy.shape == (first.batch_size,)
    e2, f2 = tr.energy_forces_fn(first)
    assert np.abs(np.asarray(f2)[np.asarray(first.fixed)]).max() == 0
