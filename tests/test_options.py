from depthmap_tpu.options import GenerationOptions, default_options_dict
from depthmap_tpu.registry import (MODELS, get_default_net_size,
                                   resolve_model_type)


def test_defaults_match_reference():
    o = GenerationOptions()
    assert o.model_type == "Depth Anything v2 Base"
    assert o.net_width == 448 and o.net_height == 448
    assert o.stereo_modes == ["left-right", "red-cyan-anaglyph"]
    assert o.stereo_divergence == 2.5
    assert o.stereo_fill_algo == "polylines_sharp"
    assert o.clipdepth_mode == "Range"
    assert o.rembg_model == "u2net"
    assert o.do_output_depth is True


def test_from_dict_drops_unknown_and_is_case_insensitive():
    o = GenerationOptions.from_dict(
        {"NET_WIDTH": 512, "bogus_key": 1, "Stereo_Divergence": 5.0})
    assert o.net_width == 512
    assert o.stereo_divergence == 5.0
    assert o.net_height == 448  # default preserved


def test_default_options_dict_shape():
    d = default_options_dict()
    assert d["MODEL_TYPE"] == "Depth Anything v2 Base"
    assert d["STEREO_BALANCE"] == 0.0


def test_registry_ids_and_names():
    assert len(MODELS) == 15
    assert resolve_model_type("res101") == 0
    assert resolve_model_type("dpt_beit_large_512") == 1
    assert resolve_model_type("zoedepth_nk") == 9
    assert resolve_model_type("Depth Anything v2 Base") == 13
    assert resolve_model_type(14) == 14
    assert get_default_net_size(0) == (448, 448)
    assert get_default_net_size(1) == (512, 512)
    assert get_default_net_size(6) == (256, 256)
    assert get_default_net_size(8) == (768, 384)   # (w, h)
    assert get_default_net_size(12) == (518, 518)


def test_reference_defaults_flag(monkeypatch):
    # DEPTHMAP_REFERENCE_DEFAULTS=1 restores the reference's literal
    # (w, h) unpacking for ZoeDepth types 7-9
    # (depthmap_generation.py:323-339 returns the dzoedepth config
    # img_size [h, w] pairs but consumes them as [w, h]).
    monkeypatch.delenv("DEPTHMAP_REFERENCE_DEFAULTS", raising=False)
    assert get_default_net_size(7) == (512, 384)
    assert get_default_net_size(8) == (768, 384)
    assert get_default_net_size(9) == (512, 384)
    monkeypatch.setenv("DEPTHMAP_REFERENCE_DEFAULTS", "1")
    assert get_default_net_size(7) == (384, 512)
    assert get_default_net_size(8) == (384, 768)
    assert get_default_net_size(9) == (384, 512)
    # non-ZoeDepth defaults are orientation-symmetric and unaffected
    assert get_default_net_size(1) == (512, 512)


def test_invert_flags():
    # models predicting depth (not disparity): 0, 7, 8, 9, 10
    for i, spec in MODELS.items():
        assert spec.predicts_depth == (i in (0, 7, 8, 9, 10))
