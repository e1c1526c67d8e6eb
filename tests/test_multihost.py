"""2-process jax.distributed test of the multi-host shard_batch branch.

The reference never scaled past one host (its multi-GPU story is
subprocess range-sharding on one machine, reference utils/subprocess.py);
shard_batch's `jax.process_count() > 1` branch is our beyond-reference
extension and needs real multi-process coverage: two coordinated jax
processes, 4 virtual CPU devices each, assembling process-local batch
halves into one global array over the (4 data x 2 model) mesh.
"""

import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_batch():
    coord = '127.0.0.1:%d' % _free_port()
    env = dict(os.environ)
    # children configure their own device farm / platform
    env.pop('XLA_FLAGS', None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, str(pid), '2'],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'process %d failed:\n%s' % (pid, out)
        assert 'MULTIHOST_OK pid=%d' % pid in out, out
