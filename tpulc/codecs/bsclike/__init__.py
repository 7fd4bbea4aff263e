"""tpulc subpackage."""
