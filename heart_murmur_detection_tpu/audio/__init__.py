from . import augment, dsp, pad, pipelines, reference_np
from .dsp import kaldi_fbank_frontend, mel_frontend, resize_bicubic_time
from .pipelines import get_entire_signal, get_split_signal, get_split_signal_fbank_pad
