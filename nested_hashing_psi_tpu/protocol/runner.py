"""Protocol runners: in-process (threads + loopback channel) and TCP mains.

The reference's only integration harness is running ServerMain+ClientMain as
two processes (SURVEY.md section 4.3); here the loopback runner additionally
allows single-process end-to-end tests.
"""

from __future__ import annotations

import threading

from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
from nested_hashing_psi_tpu.data.input import RandomDataInput
from nested_hashing_psi_tpu.protocol.channel import LoopbackChannel, TCPChannel


def make_protocol_pair(name: str):
    if name == "BatchedFHE":
        from nested_hashing_psi_tpu.protocol.batched_fhe import (
            BatchedFHEPSIClient,
            BatchedFHEPSIServer,
        )

        return BatchedFHEPSIClient, BatchedFHEPSIServer
    if name == "SimpleFHE":
        from nested_hashing_psi_tpu.protocol.simple_fhe import (
            SimpleFHEPSIClient,
            SimpleFHEPSIServer,
        )

        return SimpleFHEPSIClient, SimpleFHEPSIServer
    if name == "SimpleElGamal":
        from nested_hashing_psi_tpu.protocol.elgamal import (
            SimpleElGamalPSIClient,
            SimpleElGamalPSIServer,
        )

        return SimpleElGamalPSIClient, SimpleElGamalPSIServer
    if name == "PrecompElGamal":
        from nested_hashing_psi_tpu.protocol.elgamal import (
            PrecompElGamalPSIClient,
            PrecompElGamalPSIServer,
        )

        return PrecompElGamalPSIClient, PrecompElGamalPSIServer
    raise ValueError(f"unknown protocol {name}")


def protocol_name(params: PSIParams) -> str:
    """Flag-driven protocol dispatch (reference ServerMain.cpp:39-62)."""
    if params.fhe:
        return "BatchedFHE" if params.batched else "SimpleFHE"
    return "PrecompElGamal" if params.precomp else "SimpleElGamal"


def run_in_process(
    params: PSIParams,
    ht: HashTableParams,
    data_factory=None,
    protocol: str | None = None,
    export_dir: str = ".",
):
    """Run client+server in two threads over a loopback channel.

    Returns the client instance (with intersection + measurements) and the
    server instance. export_dir: where both parties write their CSVs when
    params.export_performance is set.
    """
    from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    name = protocol or protocol_name(params)
    client_cls, server_cls = make_protocol_pair(name)

    def default_factory():
        return RandomDataInput(
            params.server_set_size,
            params.client_set_size,
            params.intersection_set_size,
            params.item_seed,
            params.bit_size,
        )

    factory = data_factory or default_factory
    ch_client, ch_server = LoopbackChannel.pair(pass_device_arrays=True)
    client = client_cls(factory(), params, ht, ch_client, export_dir=export_dir)
    server = server_cls(factory(), params, ht, ch_server, export_dir=export_dir)

    errors: list[BaseException] = []

    def server_run():
        try:
            server.run()
        except BaseException as e:  # propagate to the main thread
            errors.append(e)
            # unblock the client: its next channel read raises instead of
            # waiting forever on a peer that already died
            ch_server.poison()

    th = threading.Thread(target=server_run, daemon=True)
    th.start()
    try:
        ok = client.run()
    except ConnectionError:
        th.join(timeout=600)
        if errors:
            raise errors[0] from None
        raise
    th.join(timeout=600)
    if errors:
        raise errors[0]
    return client, server, ok


def run_client_tcp(params: PSIParams, ht: HashTableParams, data=None, **kw):
    name = protocol_name(params)
    client_cls, _ = make_protocol_pair(name)
    data = data or RandomDataInput(
        params.server_set_size,
        params.client_set_size,
        params.intersection_set_size,
        params.item_seed,
        params.bit_size,
    )
    channel = TCPChannel.connect(params.ip, params.port)
    client = client_cls(data, params, ht, channel, **kw)
    ok = client.run()
    channel.close()
    return client, ok


def run_server_tcp(params: PSIParams, ht: HashTableParams, data=None, **kw):
    name = protocol_name(params)
    _, server_cls = make_protocol_pair(name)
    data = data or RandomDataInput(
        params.server_set_size,
        params.client_set_size,
        params.intersection_set_size,
        params.item_seed,
        params.bit_size,
    )
    channel = TCPChannel.listen(params.ip, params.port)
    server = server_cls(data, params, ht, channel, **kw)
    server.run()
    channel.close()
    return server
