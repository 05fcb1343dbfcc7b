"""Query surface mirroring the reference HTTP server routes."""
