"""Model family: AR speech-token LM, flow-matching DiT, HiFT vocoder,
CAM++ speaker encoder, S3 speech tokenizer."""
