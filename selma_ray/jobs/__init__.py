"""Cluster job entry points (`ray job submit` targets).

Each module here is a CLI program meant to run as the driver of a Ray
job on a fixed-size cluster:

    ray job submit --working-dir /root/repo -- \
        python -m selma_ray.jobs.extract_job --input ... --out ...

Unlike the library packages (which never own a Ray session), job
modules connect to the hosting cluster via ``ray.init()`` — inside a
submitted job the Ray job agent exports RAY_ADDRESS, so a bare init
attaches to the existing cluster instead of starting a new one.
"""
