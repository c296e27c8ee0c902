"""CLAP audio-tower import: embedding parity vs HF transformers."""

import numpy as np
import pytest

from llark_tpu.encoders.clap.htsat import htsat_embed
from llark_tpu.encoders.clap.import_hf import clap_params_from_hf, config_from_hf

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clap():
    from transformers import ClapAudioConfig, ClapAudioModelWithProjection

    torch.manual_seed(0)
    hf_cfg = ClapAudioConfig(
        spec_size=64,
        num_mel_bins=16,
        patch_size=4,
        patch_stride=4,
        patch_embeds_hidden_size=16,
        depths=[1, 1],
        num_attention_heads=[2, 4],
        window_size=4,
        mlp_ratio=4.0,
        hidden_size=32,  # patch_embeds_hidden_size * 2**(len(depths)-1)
        projection_dim=64,
        projection_hidden_act="relu",
        enable_fusion=False,
        drop_path_rate=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = ClapAudioModelWithProjection(hf_cfg).eval().float()
    return hf_cfg, model


def test_clap_embedding_parity(tiny_clap):
    hf_cfg, model = tiny_clap
    cfg = config_from_hf(hf_cfg)
    assert cfg.n_mels == 16 and cfg.freq_ratio == 4 and cfg.n_frames == 256

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = clap_params_from_hf(sd, cfg)

    rng = np.random.RandomState(0)
    mel = rng.randn(2, cfg.n_frames, cfg.n_mels).astype(np.float32)
    with torch.no_grad():
        ref = model(
            input_features=torch.from_numpy(mel[:, None])  # [B,1,T,F]
        ).audio_embeds.numpy()
    got = np.asarray(htsat_embed(cfg, params, mel))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
