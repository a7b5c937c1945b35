"""Inference stack: text frontend, feature frontend, TTS orchestration."""
