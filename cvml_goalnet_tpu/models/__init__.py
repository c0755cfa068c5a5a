"""Pure-functional model zoo (explicit param/state pytrees; no lazy shapes).

Reference counterpart: the three ``nn.Module``s in ``utils.py:145-272``
(``VisBl``/``AudBl``/``AVM``) plus the new text/temporal capabilities from
BASELINE.json configs 4–5.  Everything here is ``init``/``apply`` pairs over
pytrees so the whole model is a traced pure function — jit/grad/vmap/shard_map
compose directly.
"""

from cvml_goalnet_tpu.models.avm import avm_apply, avm_init
from cvml_goalnet_tpu.models.audio import audio_encoder_apply, audio_encoder_init
from cvml_goalnet_tpu.models.visual import visual_encoder_apply, visual_encoder_init
from cvml_goalnet_tpu.models.text import text_encoder_apply, text_encoder_init
from cvml_goalnet_tpu.models.temporal import temporal_scorer_apply, temporal_scorer_init

__all__ = [
    "avm_apply",
    "avm_init",
    "audio_encoder_apply",
    "audio_encoder_init",
    "visual_encoder_apply",
    "visual_encoder_init",
    "text_encoder_apply",
    "text_encoder_init",
    "temporal_scorer_apply",
    "temporal_scorer_init",
]
