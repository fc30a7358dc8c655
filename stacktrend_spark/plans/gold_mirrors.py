"""Populated in later commits."""
