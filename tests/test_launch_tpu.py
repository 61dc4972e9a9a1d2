"""TPU fleet launcher (scripts/launch_tpu.py) — dry-run command
construction. The analog of the reference's launch.py/ec2ctl surface
(launch.py:18-57,85-141,213-290; ec2ctl jobs/ssh/tail/kill/resize)."""

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "launch_tpu",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "launch_tpu.py"),
)
launch_tpu = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(launch_tpu)


def _run(argv):
    parser = launch_tpu.build_parser()
    a = parser.parse_args(argv)
    runner = launch_tpu.Runner(dry_run=True)
    rc = launch_tpu.VERBS[a.verb](a, runner)
    assert rc == 0
    return runner.commands


class TestVerbs:
    def test_up_creates_pushes_starts(self):
        cmds = _run(
            ["up", "frost", "--zone", "z", "--accelerator-type", "v5litepod-16",
             "--spot", "--algo", "es", "--exp_file", "c.json"]
        )
        create = cmds[0]
        assert create[:5] == ["gcloud", "compute", "tpus", "tpu-vm", "create"]
        assert "v5litepod-16" in create and "--spot" in create
        # push: tar + mkdir + scp + untar; start: nohup with pidfile
        assert any(c[0] == "tar" for c in cmds)
        assert any("scp" in c for c in cmds)
        start = cmds[-1]
        assert "--worker=all" in start
        remote = start[-1]
        assert "pod_run.sh" in remote and "train.pid" in remote and "c.json" in remote

    def test_jobs_lists(self):
        (cmd,) = _run(["jobs", "--zone", "z"])
        assert cmd[:5] == ["gcloud", "compute", "tpus", "tpu-vm", "list"]

    def test_kill_uses_exact_pidfile_never_pattern(self):
        (cmd,) = _run(["kill", "frost"])
        remote = cmd[-1]
        assert "kill $(cat" in remote and "train.pid" in remote
        assert "pkill" not in remote and "killall" not in remote

    def test_tail_follows_worker0_log(self):
        (cmd,) = _run(["tail", "frost", "--log_dir", "logs/x"])
        assert "--worker=0" in cmd
        assert "logs/x/log.txt" in cmd[-1]

    def test_resize_is_recreate(self):
        cmds = _run(["resize", "frost", "--accelerator-type", "v5litepod-32"])
        assert any("delete" in c for c in cmds)
        assert any("create" in c for c in cmds)

    def test_down_deletes(self):
        (cmd,) = _run(["down", "frost"])
        assert "delete" in cmd and "frost" in cmd
