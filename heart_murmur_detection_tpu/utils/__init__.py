from .audio_io import load_wav, write_wav
from .seeds import seed_everything
