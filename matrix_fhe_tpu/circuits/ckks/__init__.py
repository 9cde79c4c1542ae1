"""CKKS circuit bindings (counterpart of /root/reference/circuits/ckks/)."""
