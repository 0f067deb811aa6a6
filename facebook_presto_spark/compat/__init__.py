"""Drop-in compatibility harnesses against the reference's own test assets."""
