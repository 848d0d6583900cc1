"""Command-line interfaces: single/batch inference, speech editing, training."""
