"""Serving runtime: HTTP + gRPC streaming TTS servers and clients."""
