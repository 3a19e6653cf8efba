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
from open_genie_tpu.models.tokenizer import VideoTokenizer
from open_genie_tpu.models.action import LatentAction
from open_genie_tpu.models.dynamics import DynamicsModel, get_schedule
from open_genie_tpu.models.genie import Genie
