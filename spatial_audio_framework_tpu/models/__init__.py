"""Example renderers (L4): one module per reference example (SURVEY.md §2.4),
each following the pure-functional Config / design / init_state / process
pattern."""
from spatial_audio_framework_tpu.models import (  # noqa: F401
    ambi_bin, ambi_dec, ambi_drc, ambi_enc, ambi_roomsim, array2sh,
    beamformer, binauraliser, binauraliser_nf, conv_examples, decorrelator,
    dirass, panner, pitch_shifter, powermap, roombinauraliser, rotator,
    sldoa, spreader)
