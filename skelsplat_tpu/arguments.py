"""Legacy argparse parameter groups (port of arguments/__init__.py:47-126).

Vestigial in the reference (only the broken render.py uses them); kept for
surface parity with upstream-3DGS tooling that builds CLIs from these
groups.
"""

from __future__ import annotations

from argparse import ArgumentParser, Namespace


class GroupParams:
    pass


class ParamGroup:
    """arguments/__init__.py:18-44: auto-register dataclass-ish attributes
    as CLI flags ('_'-prefixed attrs get shorthand flags)."""

    def __init__(self, parser: ArgumentParser, name: str, fill_none=False):
        group = parser.add_argument_group(name)
        for key, value in vars(self).items():
            shorthand = False
            if key.startswith("_"):
                shorthand = True
                key = key[1:]
            t = type(value)
            value = value if not fill_none else None
            args = [f"--{key}"]
            if shorthand:
                args.append("-" + key[0:1])
            if t == bool:
                group.add_argument(*args, default=value, action="store_true")
            else:
                group.add_argument(*args, default=value, type=t)

    def extract(self, args) -> GroupParams:
        group = GroupParams()
        for arg in vars(args).items():
            if arg[0] in vars(self) or ("_" + arg[0]) in vars(self):
                setattr(group, arg[0], arg[1])
        return group


class ModelParams(ParamGroup):
    """arguments/__init__.py:47-71."""

    def __init__(self, parser, sentinel=False):
        self.sh_degree = 3
        self._source_path = ""
        self._model_path = ""
        self._images = "images"
        self._depths = ""
        self._resolution = -1
        self._white_background = False
        self.train_test_exp = False
        self.data_device = "tpu"
        self.eval = False
        super().__init__(parser, "Loading Parameters", sentinel)

    def extract(self, args):
        g = super().extract(args)
        return g


class PipelineParams(ParamGroup):
    """arguments/__init__.py:73-80."""

    def __init__(self, parser):
        self.convert_SHs_python = False
        self.compute_cov3D_python = False
        self.debug = False
        self.antialiasing = False
        super().__init__(parser, "Pipeline Parameters")


class OptimizationParams(ParamGroup):
    """arguments/__init__.py:82-112."""

    def __init__(self, parser):
        self.iterations = 30_000
        self.position_lr_init = 0.00016
        self.position_lr_final = 0.0000016
        self.position_lr_delay_mult = 0.01
        self.position_lr_max_steps = 30_000
        self.feature_lr = 0.0025
        self.opacity_lr = 0.025
        self.scaling_lr = 0.005
        self.rotation_lr = 0.001
        self.exposure_lr_init = 0.01
        self.exposure_lr_final = 0.001
        self.exposure_lr_delay_steps = 0
        self.exposure_lr_delay_mult = 0.0
        self.percent_dense = 0.01
        self.lambda_dssim = 0.2
        self.densification_interval = 100
        self.opacity_reset_interval = 3000
        self.densify_from_iter = 500
        self.densify_until_iter = 15_000
        self.densify_grad_threshold = 0.0002
        self.depth_l1_weight_init = 1.0
        self.depth_l1_weight_final = 0.01
        self.random_background = False
        self.optimizer_type = "default"
        super().__init__(parser, "Optimization Parameters")


def get_combined_args(parser: ArgumentParser):
    """arguments/__init__.py:114-126: merge cfg_args saved in the model dir
    with the CLI."""
    import os
    import sys

    cmdline_string = sys.argv[1:]
    args_cmdline = parser.parse_args(cmdline_string)
    cfgfile_string = "Namespace()"
    try:
        cfgfilepath = os.path.join(args_cmdline.model_path, "cfg_args")
        print("Looking for config file in", cfgfilepath)
        with open(cfgfilepath) as cfg_file:
            print(f"Config file found: {cfgfilepath}")
            cfgfile_string = cfg_file.read()
    except (TypeError, FileNotFoundError):
        print("Config file not found at")
    args_cfgfile = eval(cfgfile_string)  # noqa: S307 (reference behavior)

    merged_dict = vars(args_cfgfile).copy()
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged_dict[k] = v
    return Namespace(**merged_dict)
