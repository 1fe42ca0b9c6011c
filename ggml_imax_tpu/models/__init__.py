"""Model families (reference examples parity): gpt2, gptj, llama, whisper,
mnist, sam, yolo, magika. Each module exposes config + loaders + pure
forward functions."""
