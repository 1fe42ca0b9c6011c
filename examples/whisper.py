#!/usr/bin/env python
"""Whisper transcription CLI — the whisper example analog
(/root/reference/examples/whisper/main.cpp): -m model.bin -f audio.wav."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="Whisper ASR (ggml .bin models)")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--file", required=True, help="16 kHz WAV file")
    p.add_argument("-l", "--language", default="en",
                   help="language, or 'auto' to detect")
    p.add_argument("--translate", action="store_true")
    p.add_argument("-bs", "--beam_size", type=int, default=5)
    p.add_argument("--no-timestamps", action="store_true", default=True)
    p.add_argument("--dtw", action="store_true",
                   help="DTW token-level timestamps")
    args = p.parse_args()

    from ggml_imax_tpu.audio.wav import read_wav
    from ggml_imax_tpu.models import whisper as W
    from ggml_imax_tpu.runtime.whisper_pipeline import (FullParams,
                                                        WhisperPipeline)

    cfg, params, filters, vocab = W.load_legacy(args.model)
    pipe = WhisperPipeline(cfg, params, filters, vocab)
    samples = read_wav(args.file)
    lang = args.language
    if lang == "auto":
        lang = pipe.detect_language(samples)
        print(f"detected language: {lang}", file=sys.stderr)
    fp = FullParams(language=lang, translate=args.translate,
                    beam_size=args.beam_size, token_timestamps=args.dtw)
    for seg in pipe.transcribe(samples, fp):
        print(f"[{seg.t0:7.2f} -> {seg.t1:7.2f}] {seg.text}")
        if seg.token_times:
            for t, ts in zip(seg.tokens, seg.token_times):
                print(f"    {ts:7.2f}s  {pipe.decode_text([t])!r}")


if __name__ == "__main__":
    main()
