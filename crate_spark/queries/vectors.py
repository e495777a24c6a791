"""vectors query module (stub — being filled in this round)."""
