"""Entry-point applications — the rebuild of the reference's binaries
(SURVEY.md §2.5): render server (server.cpp), viewer client (client.cpp),
standalone renderer (rtracer.cpp). The MPI node layer maps to the TPU
device mesh (snail_tpu.parallel), so 'server' here owns all local devices
the way rank 0 + N node ranks owned cluster machines."""
