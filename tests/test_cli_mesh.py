"""Product-CLI multi-device training: the --multiGPU / --dataParallel /
--modelParallel flags must build a real mesh and train/eval through it.

The reference's multi-device story is ``nn.DataParallel`` under ``--multiGPU``
(``agqaHGQA.py:124-129``, ``README.md:159``).  Round-3 verdict finding: the
mesh machinery existed and was equivalence-proven, but ``run_driver`` never
constructed a mesh — these tests pin the product wiring: a tiny
``agqa_hgqa`` train->eval->checkpoint cycle on a dp8 mesh must reproduce the
single-device run's scores, and a dp4 x tp2 layout must run end-to-end.

Runs on the conftest-forced 8-device virtual CPU mesh (SURVEY.md §4 plan).
"""

import json

import pytest

BASE = [
    "--taskHGQA", "--train", "train", "--valid", "valid",
    "--noCaps", "--fromScratch",
    "--llayers", "1", "--xlayers", "1", "--rlayers", "1", "--dlayers", "1",
    "--clipLEN", "12", "--numSituations", "12", "--numRel", "2",
    "--numAct", "1", "--imageSize", "64",
    "--epochs", "2", "--batchSize", "8", "--syntheticData", "16",
    "--numWorkers", "0", "--computeDtype", "float32", "--seed", "7",
    "--logFreq", "1",
]


def _run(argv, out_dir):
    from shgvqa_tpu.cli.agqa_hgqa import main

    return main(argv + ["--output", str(out_dir)])


@pytest.mark.slow
def test_multigpu_dp8_matches_single_device(tmp_path):
    single = _run(list(BASE), tmp_path / "single")
    dp8 = _run(BASE + ["--multiGPU"], tmp_path / "dp8")

    assert dp8["steps"] == single["steps"] > 0
    assert len(dp8["history"]) == len(single["history"]) == 2
    # the SPMD program computes the same math as one device: same per-epoch
    # predictions, hence identical accuracy trajectories (dryrun_multichip
    # proves loss/param equality at 1e-4; argmax predictions are stabler)
    for h1, h8 in zip(single["history"], dp8["history"]):
        assert h8["valid"] == pytest.approx(h1["valid"], abs=1e-9)
        assert h8["hg"] == pytest.approx(h1["hg"], abs=1e-9)
    # checkpoints + metrics written through the mesh path
    names = {p.name for p in (tmp_path / "dp8").iterdir()}
    assert any(n.startswith("CURRENT") for n in names), names
    assert any(n.startswith("LAST") for n in names), names
    lines = (tmp_path / "dp8" / "metrics.jsonl").read_text().splitlines()
    assert any("total_loss" in json.loads(ln) for ln in lines)


@pytest.mark.slow
def test_dp4_tp2_mesh_end_to_end(tmp_path):
    """Tensor-parallel layout through the product CLI (tree-mode state)."""
    out = _run(BASE + ["--dataParallel", "4", "--modelParallel", "2"],
               tmp_path)
    assert out["steps"] > 0
    for h in out["history"]:
        assert 0.0 <= h["valid"] <= 1.0
        assert 0.0 <= h["hg"] <= 1.0
    names = {p.name for p in tmp_path.iterdir()}
    assert any(n.startswith("LAST") for n in names), names


def test_build_driver_mesh_policies():
    """Unit coverage of the mesh-construction policy (no training)."""
    import jax

    from shgvqa_tpu.cli.common import build_driver_mesh
    from shgvqa_tpu.configs.config import MeshConfig, tiny_test_config

    n = jax.device_count()
    assert n == 8, "conftest forces an 8-device CPU mesh"

    # no flags -> no mesh, cfg untouched
    cfg = tiny_test_config()
    mesh, cfg2 = build_driver_mesh(cfg, {})
    assert mesh is None and cfg2 is cfg

    # --multiGPU -> dp over all devices
    cfg = tiny_test_config(mesh=MeshConfig())
    cfg = cfg.replace(optim=cfg.optim.__class__(batch_size=8,
                                                eval_batch_size=2))
    mesh, cfg2 = build_driver_mesh(cfg, {"multi_gpu": True})
    assert mesh is not None and dict(mesh.shape) == {"data": 8, "model": 1}
    assert cfg2.mesh.data_parallel == 8

    # eval batch not divisible by dp -> rounded up
    assert cfg.optim.eval_batch_size == 2
    assert cfg2.optim.eval_batch_size == 8

    # train batch not divisible by dp -> hard error
    cfg = tiny_test_config(mesh=MeshConfig(data_parallel=3))
    with pytest.raises(SystemExit, match="not divisible"):
        build_driver_mesh(cfg, {})

    # layout larger than the device count -> single-device fallback with a
    # NORMALIZED mesh config (model_parallel>1 must not linger: it would
    # silently disable the flat-state fast path, train/loop.py)
    cfg = tiny_test_config(mesh=MeshConfig(data_parallel=16,
                                           model_parallel=2))
    mesh, cfg2 = build_driver_mesh(cfg, {})
    assert mesh is None
    assert cfg2.mesh.model_parallel == 1
    assert cfg2.mesh.data_parallel == -1

    # explicit dp x mp sub-mesh
    cfg = tiny_test_config(
        mesh=MeshConfig(data_parallel=2, model_parallel=2),
        optim=tiny_test_config().optim.__class__(batch_size=4,
                                                 eval_batch_size=4))
    mesh, cfg2 = build_driver_mesh(cfg, {})
    assert mesh is not None and dict(mesh.shape) == {"data": 2, "model": 2}
