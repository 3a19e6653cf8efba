"""Stock blueprint smoke tests: every pre-made blueprint parses and its
dims are self-consistent (mirrors the reference's blueprint constants,
`/root/reference/genie/tokenizer.py:24-205`, `genie/__init__.py:10-54`)."""
import jax
import jax.numpy as jnp
import pytest

from open_genie_tpu.models.blueprints import (
    DYNAMICS_DESC,
    LATENT_ACT_DEC,
    LATENT_ACT_ENC,
    MAGVIT2_DEC_DESC,
    MAGVIT2_ENC_DESC,
    REPR_TOK_DEC,
    REPR_TOK_ENC,
    get_dec,
    get_enc,
)
from open_genie_tpu.modules import blueprint_st_factor, parse_blueprint


@pytest.mark.parametrize("bp,n_layers", [
    (MAGVIT2_ENC_DESC, 27),
    (MAGVIT2_DEC_DESC, 31),
    (REPR_TOK_ENC, 9),
    (REPR_TOK_DEC, 9),
    (LATENT_ACT_ENC, 5),
    (LATENT_ACT_DEC, 5),
    (DYNAMICS_DESC, 6),
])
def test_blueprints_parse(bp, n_layers):
    layers, ext = parse_blueprint(bp)
    assert len(layers) == n_layers
    assert len(ext) == n_layers


def test_magvit2_compression_factor():
    """MAGVIT2: T/4, H/8, W/8 encode; decoder exactly inverts."""
    enc_fact = blueprint_st_factor(MAGVIT2_ENC_DESC)
    dec_fact = blueprint_st_factor(MAGVIT2_DEC_DESC)
    assert enc_fact == pytest.approx(1.0 / (4 * 8 * 8))
    assert enc_fact * dec_fact == pytest.approx(1.0)


def test_latent_act_factors_cancel():
    assert blueprint_st_factor(LATENT_ACT_ENC) * blueprint_st_factor(
        LATENT_ACT_DEC
    ) == pytest.approx(1.0)


def test_magvit2_dec_has_adaptive_norm_conditioning():
    _, ext = parse_blueprint(MAGVIT2_DEC_DESC)
    assert sum(ext) == 4  # four adaptive_group_norm layers take the cond


def test_get_enc_dec_lookup():
    assert get_enc("magvit2") is MAGVIT2_ENC_DESC
    assert get_dec("repr_tok") is REPR_TOK_DEC
    with pytest.raises(ValueError):
        get_enc("nope")
