"""HTTP serving surface (aiohttp): OpenAI-style speech API with continuous batching."""
