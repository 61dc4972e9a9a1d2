#!/usr/bin/env python
"""Cloud TPU fleet launcher + controller.

The TPU-native analog of the reference's AWS machinery:

* `scripts/launch.py` — packages the tree, uploads to S3, boots an EC2
  master + a worker auto-scaling group whose user-data scripts install
  redis and start master/workers (launch.py:18-57, 85-141, 213-290).
* `scripts/ec2ctl` — fleet verbs: jobs / ssh / tail / resize / kill.

On Cloud TPU there is no master/worker asymmetry and no broker to install:
every host of a slice runs the same SPMD program (scripts/pod_run.sh) and
JAX's coordinator bootstraps itself. So "launch" reduces to: create the
slice, push the tree, start the program on every host; the ec2ctl verbs map
onto `gcloud compute tpus tpu-vm` subcommands.

Verbs:
  up      create slice (+ optional --spot, the EC2 spot analog, launch.py:213-235)
  push    rsync the repo to every host        (launch.py:18-57 tar→S3→boot fetch)
  start   nohup pod_run.sh on every host      (launch.py make_master/worker_script)
  jobs    list slices + state                 (ec2ctl jobs)
  ssh     shell on one host                   (ec2ctl ssh)
  tail    follow training log on host 0       (ec2ctl tail)
  kill    stop training via recorded pidfile  (ec2ctl kill)
  resize  delete + recreate at a new slice size (ec2ctl resize; TPU slices
          have fixed topology, so resize = recreate — training resumes from
          the latest snapshot in --log_dir, utils/checkpoint.py)
  down    delete the slice

`--dry_run` prints every gcloud/shell command instead of executing — also
the unit-test surface (tests/test_launch_tpu.py).
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
from typing import List

REMOTE_DIR = "~/deep_neuroevolution_tpu_run"
PIDFILE = f"{REMOTE_DIR}/train.pid"
LOGFILE = f"{REMOTE_DIR}/train.out"


def _gcloud_tpu(args) -> List[str]:
    return ["gcloud", "compute", "tpus", "tpu-vm"] + args


class Runner:
    def __init__(self, dry_run: bool):
        self.dry_run = dry_run
        self.commands: List[List[str]] = []  # recorded for tests

    def run(self, cmd: List[str], **kw) -> int:
        self.commands.append(cmd)
        print("+ " + " ".join(shlex.quote(c) for c in cmd))
        if self.dry_run:
            return 0
        return subprocess.call(cmd, **kw)


def _zone_args(a) -> List[str]:
    return ["--zone", a.zone]


def _ssh_all(a, runner: Runner, remote_cmd: str) -> int:
    return runner.run(
        _gcloud_tpu(
            ["ssh", a.name, *_zone_args(a), "--worker=all", "--command", remote_cmd]
        )
    )


def cmd_up(a, runner: Runner) -> int:
    create = _gcloud_tpu(
        [
            "create",
            a.name,
            *_zone_args(a),
            "--accelerator-type",
            a.accelerator_type,
            "--version",
            a.runtime_version,
        ]
    )
    if a.spot:
        create.append("--spot")
    rc = runner.run(create)
    if rc:
        return rc
    rc = cmd_push(a, runner)
    if rc:
        return rc
    return cmd_start(a, runner)


def cmd_push(a, runner: Runner) -> int:
    # tar locally, scp to all hosts, unpack — the S3-less equivalent of
    # launch.py:18-57's upload_archive
    tarball = "/tmp/nevo_tpu_push.tar.gz"
    rc = runner.run(
        [
            "tar",
            "--exclude=.git",
            "--exclude=logs",
            "--exclude=__pycache__",
            "-czf",
            tarball,
            "-C",
            a.repo,
            ".",
        ]
    )
    if rc:
        return rc
    rc = _ssh_all(a, runner, f"mkdir -p {REMOTE_DIR}")
    if rc:
        return rc
    rc = runner.run(
        _gcloud_tpu(
            ["scp", tarball, f"{a.name}:{REMOTE_DIR}/", *_zone_args(a), "--worker=all"]
        )
    )
    if rc:
        return rc
    return _ssh_all(
        a, runner, f"cd {REMOTE_DIR} && tar -xzf {tarball.split('/')[-1]}"
    )


def cmd_start(a, runner: Runner) -> int:
    # every host runs the identical SPMD program; JAX discovers the
    # coordinator on TPU slices (parallel/distributed.py)
    train = (
        f"cd {REMOTE_DIR} && "
        f"nohup ./scripts/pod_run.sh {shlex.quote(a.algo)} {shlex.quote(a.exp_file)} "
        f"{shlex.quote(a.log_dir)} > {LOGFILE} 2>&1 & echo $! > {PIDFILE}"
    )
    return _ssh_all(a, runner, train)


def cmd_jobs(a, runner: Runner) -> int:
    return runner.run(
        ["gcloud", "compute", "tpus", "tpu-vm", "list", *_zone_args(a)]
    )


def cmd_ssh(a, runner: Runner) -> int:
    return runner.run(
        _gcloud_tpu(["ssh", a.name, *_zone_args(a), f"--worker={a.worker}"])
    )


def cmd_tail(a, runner: Runner) -> int:
    return runner.run(
        _gcloud_tpu(
            [
                "ssh",
                a.name,
                *_zone_args(a),
                "--worker=0",
                "--command",
                f"tail -n {a.lines} -f {a.log_dir}/log.txt",
            ]
        )
    )


def cmd_kill(a, runner: Runner) -> int:
    # exact-pid kill via the pidfile recorded at start — never by pattern
    return _ssh_all(a, runner, f"test -f {PIDFILE} && kill $(cat {PIDFILE}) || true")


def cmd_down(a, runner: Runner) -> int:
    return runner.run(_gcloud_tpu(["delete", a.name, *_zone_args(a), "--quiet"]))


def cmd_resize(a, runner: Runner) -> int:
    rc = cmd_down(a, runner)
    if rc:
        return rc
    return cmd_up(a, runner)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dry_run", action="store_true")
    sub = p.add_subparsers(dest="verb", required=True)

    def common(sp, name=True):
        if name:
            sp.add_argument("name", help="TPU slice name")
        sp.add_argument("--zone", default="us-central2-b")

    def traincfg(sp):
        sp.add_argument("--algo", default="es")
        sp.add_argument("--exp_file", default="configurations/frostbite_es.json")
        sp.add_argument("--log_dir", default="logs/run")
        sp.add_argument("--repo", default=".")

    up = sub.add_parser("up")
    common(up)
    traincfg(up)
    up.add_argument("--accelerator-type", default="v5litepod-8")
    up.add_argument("--runtime-version", default="v2-alpha-tpuv5-lite")
    up.add_argument("--spot", action="store_true")

    push = sub.add_parser("push")
    common(push)
    traincfg(push)

    start = sub.add_parser("start")
    common(start)
    traincfg(start)

    jobs = sub.add_parser("jobs")
    common(jobs, name=False)

    ssh = sub.add_parser("ssh")
    common(ssh)
    ssh.add_argument("--worker", default="0")

    tail = sub.add_parser("tail")
    common(tail)
    tail.add_argument("--log_dir", default="logs/run")
    tail.add_argument("--lines", type=int, default=50)

    kill = sub.add_parser("kill")
    common(kill)

    down = sub.add_parser("down")
    common(down)

    resize = sub.add_parser("resize")
    common(resize)
    traincfg(resize)
    resize.add_argument("--accelerator-type", default="v5litepod-16")
    resize.add_argument("--runtime-version", default="v2-alpha-tpuv5-lite")
    resize.add_argument("--spot", action="store_true")

    return p


VERBS = {
    "up": cmd_up,
    "push": cmd_push,
    "start": cmd_start,
    "jobs": cmd_jobs,
    "ssh": cmd_ssh,
    "tail": cmd_tail,
    "kill": cmd_kill,
    "down": cmd_down,
    "resize": cmd_resize,
}


def main(argv=None) -> int:
    a = build_parser().parse_args(argv)
    runner = Runner(a.dry_run)
    return VERBS[a.verb](a, runner)


if __name__ == "__main__":
    sys.exit(main())
