"""Dataset / evaluation tooling (host-side scripts layer)."""
