"""Operator CLI tools: clip encode/decode, media generation, diagnostics."""
