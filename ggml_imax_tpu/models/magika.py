"""Magika — file-type identification (1-D conv-free dense classifier).

Reference: examples/magika/main.cpp — GGUF weights (:111-127), graph
magika_graph (:188-248): one-hot(257) over a 1536-byte window (512 bytes
each from the beginning / middle / end of the file, padded with token 256,
:276-300), dense+gelu, 4-token grouping (reshape to 384 x 512), layer norm
over the position axis, two dense+gelu blocks, global max pool, layer norm,
label head + softmax. The 113-label table is the model's output interface
(main.cpp:11-37).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops.activations import gelu
from ..ops.norms import layer_norm

LABELS = ['ai', 'apk', 'appleplist', 'asm', 'asp', 'batch', 'bmp', 'bzip', 'c', 'cab', 'cat', 'chm', 'coff', 'crx', 'cs', 'css', 'csv', 'deb', 'dex', 'dmg', 'doc', 'docx', 'elf', 'emf', 'eml', 'epub', 'flac', 'gif', 'go', 'gzip', 'hlp', 'html', 'ico', 'ini', 'internetshortcut', 'iso', 'jar', 'java', 'javabytecode', 'javascript', 'jpeg', 'json', 'latex', 'lisp', 'lnk', 'm3u', 'macho', 'makefile', 'markdown', 'mht', 'mp3', 'mp4', 'mscompress', 'msi', 'mum', 'odex', 'odp', 'ods', 'odt', 'ogg', 'outlook', 'pcap', 'pdf', 'pebin', 'pem', 'perl', 'php', 'png', 'postscript', 'powershell', 'ppt', 'pptx', 'python', 'pythonbytecode', 'rar', 'rdf', 'rpm', 'rst', 'rtf', 'ruby', 'rust', 'scala', 'sevenzip', 'shell', 'smali', 'sql', 'squashfs', 'svg', 'swf', 'symlinktext', 'tar', 'tga', 'tiff', 'torrent', 'ttf', 'txt', 'unknown', 'vba', 'wav', 'webm', 'webp', 'winregistry', 'wmf', 'xar', 'xls', 'xlsb', 'xlsx', 'xml', 'xpi', 'xz', 'yaml', 'zip', 'zlibstream']

BEG_SIZE = MID_SIZE = END_SIZE = 512
BLOCK = BEG_SIZE + MID_SIZE + END_SIZE          # 1536
PAD_TOKEN = 256
N_VOCAB = 257
NORM_EPS = 1e-3                                  # hparams.f_norm_eps


def load_gguf(path: str | Path):
    names = {
        "dense_w": "dense/kernel:0", "dense_b": "dense/bias:0",
        "ln_g": "layer_normalization/gamma:0",
        "ln_b": "layer_normalization/beta:0",
        "dense1_w": "dense_1/kernel:0", "dense1_b": "dense_1/bias:0",
        "dense2_w": "dense_2/kernel:0", "dense2_b": "dense_2/bias:0",
        "ln1_g": "layer_normalization_1/gamma:0",
        "ln1_b": "layer_normalization_1/beta:0",
        "label_w": "target_label/kernel:0", "label_b": "target_label/bias:0",
    }
    params = {}
    with GGUFReader(path) as r:
        for k, n in names.items():
            params[k] = jnp.asarray(r.tensor_array(n).astype(np.float32))
    return params


def synthetic_params(rng: np.random.Generator, n_label: int = len(LABELS)):
    def d(i, o):
        return jnp.asarray((rng.standard_normal((i, o)) * 0.05).astype(np.float32))

    def v(n, fill=0.0):
        return jnp.full(n, fill, jnp.float32)

    return {"dense_w": d(N_VOCAB, 128), "dense_b": v(128),
            "ln_g": v(384, 1.0), "ln_b": v(384),
            "dense1_w": d(512, 256), "dense1_b": v(256),
            "dense2_w": d(256, 256), "dense2_b": v(256),
            "ln1_g": v(256, 1.0), "ln1_b": v(256),
            "label_w": d(256, n_label), "label_b": v(n_label)}


def file_tokens(data: bytes) -> np.ndarray:
    """(1536,) int32 token window: beg/mid/end 512-byte reads, padded with
    PAD_TOKEN (main.cpp:276-300)."""
    buf = np.full(BLOCK, PAD_TOKEN, np.int32)
    b = np.frombuffer(data, np.uint8)
    n = len(b)
    beg = b[:BEG_SIZE]
    buf[:len(beg)] = beg
    mid_off = max(0, (n - MID_SIZE) // 2)
    mid = b[mid_off:mid_off + MID_SIZE]
    buf[BEG_SIZE + (MID_SIZE - len(mid)) // 2:
        BEG_SIZE + (MID_SIZE - len(mid)) // 2 + len(mid)] = mid
    end = b[-END_SIZE:] if n else b[:0]
    buf[BLOCK - len(end):] = end
    return buf


def forward(params, tokens):
    """tokens: (N, 1536) int32 -> label probabilities (N, n_label)."""
    x = jax.nn.one_hot(tokens, N_VOCAB, dtype=jnp.float32)   # (N, 1536, 257)
    x = gelu(x @ params["dense_w"] + params["dense_b"])      # (N, 1536, 128)
    n = x.shape[0]
    x = x.reshape(n, 384, 512)                               # 4-token groups
    # layer norm over the position axis (the reference normalizes ne0=384
    # after a transpose): normalize each feature across positions
    x = x.transpose(0, 2, 1)                                 # (N, 512, 384)
    x = layer_norm(x, params["ln_g"], params["ln_b"], eps=NORM_EPS)
    x = x.transpose(0, 2, 1)                                 # (N, 384, 512)
    x = gelu(x @ params["dense1_w"] + params["dense1_b"])    # (N, 384, 256)
    x = gelu(x @ params["dense2_w"] + params["dense2_b"])
    x = x.max(axis=1)                                        # global max pool
    x = layer_norm(x, params["ln1_g"], params["ln1_b"], eps=NORM_EPS)
    logits = x @ params["label_w"] + params["label_b"]
    return jax.nn.softmax(logits, axis=-1)


def identify(params, data: bytes, top: int = 5):
    probs = np.asarray(forward(params, jnp.asarray(file_tokens(data)[None])))[0]
    order = np.argsort(-probs)[:top]
    return [(LABELS[i] if i < len(LABELS) else str(i), float(probs[i]))
            for i in order]
