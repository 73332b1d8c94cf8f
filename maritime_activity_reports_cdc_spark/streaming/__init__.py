"""Change-feed tailing: checkpointed chunk replay + Structured Streaming."""
