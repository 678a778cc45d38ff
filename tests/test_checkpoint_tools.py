"""checkpoint_tools CLI: .pt → orbax → .pt round trip."""

import numpy as np
import torch
import yaml

import jax

from tests import torch_mirror as tm


def test_import_export_roundtrip(tmp_path):
    p = tm.small_gen_params()
    conf = {
        "new_size": 32, "crop_image_height": 32, "crop_image_width": 32,
        "gen_state": 1, "guided": 1,
        "gen": dict(p), "dis": dict(tm.small_dis_params()),
    }
    cpath = tmp_path / "c.yaml"
    cpath.write_text(yaml.safe_dump(conf))

    torch.manual_seed(0)
    tgen = tm.MirrorAdaINGenDouble(3, p)
    pt_in = tmp_path / "gen_in.pt"
    torch.save({"2": tgen.state_dict()}, pt_in)

    from munit_tpu.cli.checkpoint_tools import main
    ckpt_dir = str(tmp_path / "orbax")
    main(["import", "--config", str(cpath), "--gen", str(pt_in),
          "--out", ckpt_dir, "--step", "7"])
    pt_out = tmp_path / "gen_out.pt"
    main(["export", "--config", str(cpath), "--ckpt", ckpt_dir,
          "--out", str(pt_out)])

    sd_in = {k: v.numpy() for k, v in torch.load(
        pt_in, weights_only=True)["2"].items()}
    sd_out = {k: v.numpy() for k, v in torch.load(
        pt_out, weights_only=True)["2"].items()}
    assert set(sd_in) == set(sd_out)
    for k in sd_in:
        np.testing.assert_allclose(sd_in[k], sd_out[k], atol=1e-7, err_msg=k)
