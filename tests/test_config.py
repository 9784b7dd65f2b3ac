import os

from racformer_tpu.config import Config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "racformer_tpu", "configs")


def test_base_config_loads():
    cfg = Config.fromfile(os.path.join(CFG_DIR, "racformer_r50_nuimg_704x256_f8.py"))
    assert cfg.model["num_cams"] == 6
    assert cfg.model["num_query"] == 900
    assert cfg.decoder["d_region_list"] == [0.08, 0.07, 0.06, 0.05, 0.04, 0.03]
    assert cfg.optimizer["base_lr"] == 4e-4


def test_base_inheritance_and_override():
    cfg = Config.fromfile(
        os.path.join(CFG_DIR, "racformer_r50_nuimg_704x256_f8_3cam_3rad_mini.py")
    )
    # overlay chain: mini -> 3cam_3rad -> base
    assert cfg.model["num_cams"] == 3  # overridden
    assert cfg.model["num_query"] == 900  # inherited
    assert cfg.max_samples == 50
    assert cfg.eval_front_only is True

    cfg.merge_override(["model.num_frames=4", "total_epochs=1", "radar.max_points=256"])
    assert cfg.model["num_frames"] == 4
    assert cfg.total_epochs == 1
    assert cfg.radar["max_points"] == 256
