"""Tools: model re-quantization, perplexity, imatrix collection."""
from .quantize import requantize_gguf
from .perplexity import perplexity
