#!/usr/bin/env python
"""ROS node: mono (reference: Examples/ROS/ORB_SLAM3/src/ros_mono.cc)."""
import sys
import common

if __name__ == "__main__":
    sys.exit(common.main("mono", sys.argv[1:]))
