from .wav import read_wav, write_wav, WavFormatError
from .io import media2sig16kmono, check_ffmpeg, SR

__all__ = ["read_wav", "write_wav", "WavFormatError", "media2sig16kmono",
           "check_ffmpeg", "SR"]
