"""Placeholder — queries registered in later phase."""
