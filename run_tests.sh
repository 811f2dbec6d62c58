#!/bin/bash
# Run the test suite on virtual CPU devices WITHOUT dialing the axon TPU
# relay (sitecustomize registers the axon PJRT plugin at interpreter start;
# concurrent processes contend for the single TPU grant and deadlock).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest "$@"
