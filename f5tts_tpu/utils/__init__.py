"""Config, logging, misc host utilities."""
