from .fft import hartley
