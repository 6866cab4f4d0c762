// Minimal grid_map_core shim for compiling the REFERENCE GroundGrid /
// GroundSegmentation sources (/root/reference/src/*.cpp) in place, against
// real Eigen, with no ROS/grid_map installation (VERDICT r4 "Next round" #1).
//
// This re-implements exactly the slice of grid_map::GridMap the reference
// consumes -- named float layer matrices over a circular buffer, move() with
// damage regions, position<->index math, SubmapIterator,
// convertToDefaultStartIndex -- following the upstream ANYbotics grid_map
// (1.6.x, the ROS1 Noetic release the reference builds against:
// package.xml depends on grid_map_ros/grid_map_core). Upstream expression
// structure is preserved where floating-point rounding order matters:
//   * getIndexFromPosition: ((position - offset - mapPosition) / res), then
//     buffer-order transform via int-cast truncation (NOT floor/lround)
//   * getPositionFromIndex: mapPosition + (0.5*length - 0.5*res) +
//     res * (-unwrappedIndex)
//   * getIndexShiftFromPositionShift: static_cast<int>(x + 0.5*sign(x))
//     (half-away-from-zero, AUDIT.md #1)
//   * move(): cleared cells (all layers) become NaN; damage regions are
//     physical (buffer-frame) row/col bands computed pre-shift
//   * setGeometry: size = round(length/res); length_ = size * res
//
// CAVEAT (documented in CROSSCHECK.md): this file is still *our* reading of
// grid_map. Compiling the reference against it eliminates shared-misreading
// risk for the 618 lines of reference algorithm code, not for grid_map
// itself, whose sources are not present in this environment.

#pragma once

#include <Eigen/Core>
#include <Eigen/Dense>

#include <cmath>
#include <cstdlib>
#include <memory>
#include <stdexcept>
#include <string>
#include <unordered_map>
#include <vector>

namespace grid_map {

using Matrix = Eigen::MatrixXf;
using DataType = float;
using Position = Eigen::Vector2d;
using Vector = Eigen::Vector2d;
using Index = Eigen::Array2i;
using Size = Eigen::Array2i;
using Length = Eigen::Array2d;
using Time = uint64_t;

// ---------------------------------------------------------------- math bits

inline void wrapIndexToRange(int& index, int bufferSize) {
  if (index < bufferSize) {
    if (index >= 0) return;
    if (index >= -bufferSize) {
      index += bufferSize;
      return;
    }
    index = index % bufferSize;
    index += bufferSize;
  } else if (index < bufferSize * 2) {
    index -= bufferSize;
  } else {
    index = index % bufferSize;
  }
}

inline void wrapIndexToRange(Index& index, const Size& bufferSize) {
  for (int i = 0; i < index.size(); ++i) wrapIndexToRange(index(i), bufferSize(i));
}

inline bool checkIfStartIndexAtDefaultPosition(const Index& bufferStartIndex) {
  return (bufferStartIndex == 0).all();
}

inline bool checkIfIndexInRange(const Index& index, const Size& bufferSize) {
  return index[0] >= 0 && index[1] >= 0 && index[0] < bufferSize[0] &&
         index[1] < bufferSize[1];
}

inline void getVectorToOrigin(Vector& vectorToOrigin, const Length& mapLength) {
  vectorToOrigin = (0.5 * mapLength).matrix();
}

inline void getVectorToFirstCell(Vector& vectorToFirstCell,
                                 const Length& mapLength, double resolution) {
  Vector vectorToOrigin;
  getVectorToOrigin(vectorToOrigin, mapLength);
  vectorToFirstCell = (vectorToOrigin.array() - 0.5 * resolution).matrix();
}

// buffer order <-> map frame is a sign flip on both axes (row 0 = max x)
inline Index getIndexFromBufferIndex(const Index& bufferIndex,
                                     const Size& bufferSize,
                                     const Index& bufferStartIndex) {
  if (checkIfStartIndexAtDefaultPosition(bufferStartIndex)) return bufferIndex;
  Index index = bufferIndex - bufferStartIndex;
  wrapIndexToRange(index, bufferSize);
  return index;
}

inline Index getBufferIndexFromIndex(const Index& index, const Size& bufferSize,
                                     const Index& bufferStartIndex) {
  if (checkIfStartIndexAtDefaultPosition(bufferStartIndex)) return index;
  Index bufferIndex = index + bufferStartIndex;
  wrapIndexToRange(bufferIndex, bufferSize);
  return bufferIndex;
}

inline Vector getIndexVectorFromIndex(const Index& index, const Size& bufferSize,
                                      const Index& bufferStartIndex) {
  const Index unwrapped = getIndexFromBufferIndex(index, bufferSize, bufferStartIndex);
  return Vector(-static_cast<double>(unwrapped[0]), -static_cast<double>(unwrapped[1]));
}

// upstream transformMapFrameToBufferOrder: int-cast truncation of the
// negated index vector (trunc toward zero == floor of the flipped value for
// in-map positions)
inline Index transformMapFrameToBufferOrder(const Vector& indexVector) {
  return Index(-static_cast<int>(indexVector[0]), -static_cast<int>(indexVector[1]));
}

inline bool getPositionFromIndex(Position& position, const Index& index,
                                 const Length& mapLength, const Position& mapPosition,
                                 double resolution, const Size& bufferSize,
                                 const Index& bufferStartIndex) {
  if (!checkIfIndexInRange(index, bufferSize)) return false;
  Vector offset;
  getVectorToFirstCell(offset, mapLength, resolution);
  position = mapPosition + offset +
             resolution * getIndexVectorFromIndex(index, bufferSize, bufferStartIndex);
  return true;
}

inline bool checkIfPositionWithinMap(const Position& position,
                                     const Length& mapLength,
                                     const Position& mapPosition) {
  Vector offset;
  getVectorToOrigin(offset, mapLength);
  const Position positionTransformed = -(position - mapPosition - offset);
  return positionTransformed.x() >= 0.0 && positionTransformed.y() >= 0.0 &&
         positionTransformed.x() < mapLength(0) &&
         positionTransformed.y() < mapLength(1);
}

inline bool getIndexFromPosition(Index& index, const Position& position,
                                 const Length& mapLength, const Position& mapPosition,
                                 double resolution, const Size& bufferSize,
                                 const Index& bufferStartIndex) {
  Vector offset;
  getVectorToOrigin(offset, mapLength);
  const Vector indexVector = ((position - offset - mapPosition).array() / resolution).matrix();
  index = getBufferIndexFromIndex(transformMapFrameToBufferOrder(indexVector),
                                  bufferSize, bufferStartIndex);
  return checkIfPositionWithinMap(position, mapLength, mapPosition) &&
         checkIfIndexInRange(index, bufferSize);
}

inline void getIndexShiftFromPositionShift(Index& indexShift,
                                           const Vector& positionShift,
                                           double resolution) {
  Vector indexShiftVectorTemp = (positionShift.array() / resolution).matrix();
  Eigen::Vector2i indexShiftVector;
  for (int i = 0; i < indexShiftVector.size(); ++i) {
    indexShiftVector[i] = static_cast<int>(
        indexShiftVectorTemp[i] + 0.5 * (indexShiftVectorTemp[i] > 0 ? 1 : -1));
  }
  indexShift = Index(-indexShiftVector[0], -indexShiftVector[1]);
}

inline void getPositionShiftFromIndexShift(Vector& positionShift,
                                           const Index& indexShift,
                                           double resolution) {
  positionShift =
      Vector(-static_cast<double>(indexShift[0]), -static_cast<double>(indexShift[1])) *
      resolution;
}

// ------------------------------------------------------------ BufferRegion

class BufferRegion {
 public:
  enum class Quadrant { Undefined = 0, TopLeft, TopRight, BottomLeft, BottomRight };
  BufferRegion() : startIndex_(0, 0), size_(0, 0), quadrant_(Quadrant::Undefined) {}
  BufferRegion(const Index& startIndex, const Size& size, Quadrant quadrant)
      : startIndex_(startIndex), size_(size), quadrant_(quadrant) {}
  const Index& getStartIndex() const { return startIndex_; }
  const Size& getSize() const { return size_; }
  Quadrant getQuadrant() const { return quadrant_; }

 private:
  Index startIndex_;
  Size size_;
  Quadrant quadrant_;
};

// ----------------------------------------------------------------- GridMap

class GridMap {
 public:
  explicit GridMap(const std::vector<std::string>& layers) : layers_(layers) {
    position_.setZero();
    length_.setZero();
    resolution_ = 0.0;
    size_.setZero();
    startIndex_.setZero();
    for (const auto& layer : layers_) data_[layer] = Matrix();
  }
  GridMap() : GridMap(std::vector<std::string>()) {}

  void setFrameId(const std::string& frameId) { frameId_ = frameId; }
  const std::string& getFrameId() const { return frameId_; }

  void setGeometry(const Length& length, const double resolution,
                   const Position& position) {
    // upstream: size = round(length / res); true length re-derived from size
    size_(0) = static_cast<int>(std::round(length(0) / resolution));
    size_(1) = static_cast<int>(std::round(length(1) / resolution));
    for (auto& kv : data_) kv.second.resize(size_(0), size_(1));
    clearAll();
    resolution_ = resolution;
    length_ = (size_.cast<double>() * resolution_).array();
    position_ = position;
    startIndex_.setZero();
  }

  void add(const std::string& layer, const double value = NAN) {
    auto it = data_.find(layer);
    if (it != data_.end()) {
      it->second = Matrix::Constant(size_(0), size_(1), static_cast<float>(value));
    } else {
      data_[layer] = Matrix::Constant(size_(0), size_(1), static_cast<float>(value));
      layers_.push_back(layer);
    }
  }

  bool exists(const std::string& layer) const { return data_.count(layer) != 0; }

  const Matrix& get(const std::string& layer) const { return data_.at(layer); }
  Matrix& get(const std::string& layer) { return data_.at(layer); }
  const Matrix& operator[](const std::string& layer) const { return get(layer); }
  Matrix& operator[](const std::string& layer) { return get(layer); }

  float& at(const std::string& layer, const Index& index) {
    return data_.at(layer)(index(0), index(1));
  }
  float at(const std::string& layer, const Index& index) const {
    return data_.at(layer)(index(0), index(1));
  }

  bool getIndex(const Position& position, Index& index) const {
    return getIndexFromPosition(index, position, length_, position_, resolution_,
                                size_, startIndex_);
  }
  bool getPosition(const Index& index, Position& position) const {
    return getPositionFromIndex(position, index, length_, position_, resolution_,
                                size_, startIndex_);
  }
  bool isInside(const Position& position) const {
    return checkIfPositionWithinMap(position, length_, position_);
  }

  const Length& getLength() const { return length_; }
  const Position& getPosition() const { return position_; }
  double getResolution() const { return resolution_; }
  const Size& getSize() const { return size_; }
  const Index& getStartIndex() const { return startIndex_; }
  const std::vector<std::string>& getLayers() const { return layers_; }

  void clearAll() {
    for (auto& kv : data_) kv.second.setConstant(NAN);
  }

  bool move(const Position& position, std::vector<BufferRegion>& newRegions) {
    Index indexShift;
    const Position positionShift = position - position_;
    getIndexShiftFromPositionShift(indexShift, positionShift.matrix(), resolution_);
    Position alignedPositionShift;
    getPositionShiftFromIndexShift(alignedPositionShift, indexShift, resolution_);

    // Delete fields that fall out of map (and become empty cells).
    for (int i = 0; i < indexShift.size(); ++i) {
      if (indexShift(i) != 0) {
        if (std::abs(indexShift(i)) >= getSize()(i)) {
          // Entire map is dropped.
          clearAll();
          newRegions.push_back(
              BufferRegion(Index(0, 0), getSize(), BufferRegion::Quadrant::Undefined));
        } else {
          // Drop cells out of map.
          const int sign = (indexShift(i) > 0 ? 1 : -1);
          const int startIndex = startIndex_(i) - (sign < 0 ? 1 : 0);
          const int endIndex = startIndex - sign + indexShift(i);
          const int nCells = std::abs(indexShift(i));
          int index = (sign > 0 ? startIndex : endIndex);
          wrapIndexToRange(index, getSize()(i));

          if (index + nCells <= getSize()(i)) {
            // One region to drop.
            if (i == 0) {
              clearRows(index, nCells);
              newRegions.push_back(BufferRegion(Index(index, 0),
                                                Size(nCells, getSize()(1)),
                                                BufferRegion::Quadrant::Undefined));
            } else {
              clearCols(index, nCells);
              newRegions.push_back(BufferRegion(Index(0, index),
                                                Size(getSize()(0), nCells),
                                                BufferRegion::Quadrant::Undefined));
            }
          } else {
            // Two regions to drop.
            const int firstIndex = index;
            const int firstNCells = getSize()(i) - firstIndex;
            const int secondIndex = 0;
            const int secondNCells = nCells - firstNCells;
            if (i == 0) {
              clearRows(firstIndex, firstNCells);
              newRegions.push_back(BufferRegion(Index(firstIndex, 0),
                                                Size(firstNCells, getSize()(1)),
                                                BufferRegion::Quadrant::Undefined));
              clearRows(secondIndex, secondNCells);
              newRegions.push_back(BufferRegion(Index(secondIndex, 0),
                                                Size(secondNCells, getSize()(1)),
                                                BufferRegion::Quadrant::Undefined));
            } else {
              clearCols(firstIndex, firstNCells);
              newRegions.push_back(BufferRegion(Index(0, firstIndex),
                                                Size(getSize()(0), firstNCells),
                                                BufferRegion::Quadrant::Undefined));
              clearCols(secondIndex, secondNCells);
              newRegions.push_back(BufferRegion(Index(0, secondIndex),
                                                Size(getSize()(0), secondNCells),
                                                BufferRegion::Quadrant::Undefined));
            }
          }
        }
      }
    }

    // Update information.
    startIndex_ += indexShift;
    wrapIndexToRange(startIndex_, getSize());
    position_ += alignedPositionShift;
    return indexShift.any();
  }

  void convertToDefaultStartIndex() {
    if (checkIfStartIndexAtDefaultPosition(startIndex_)) return;
    const int n0 = size_(0), n1 = size_(1);
    const int s0 = startIndex_(0), s1 = startIndex_(1);
    for (auto& kv : data_) {
      const Matrix old = kv.second;  // copy
      Matrix& m = kv.second;
      for (int i = 0; i < n0; ++i) {
        const int oi = (i + s0) % n0;
        for (int j = 0; j < n1; ++j) m(i, j) = old(oi, (j + s1) % n1);
      }
    }
    startIndex_.setZero();
  }

 private:
  void clearRows(int index, int nRows) {
    for (auto& kv : data_)
      kv.second.block(index, 0, nRows, getSize()(1)).setConstant(NAN);
  }
  void clearCols(int index, int nCols) {
    for (auto& kv : data_)
      kv.second.block(0, index, getSize()(0), nCols).setConstant(NAN);
  }

  std::unordered_map<std::string, Matrix> data_;
  std::vector<std::string> layers_;
  std::string frameId_;
  Length length_;
  double resolution_;
  Position position_;
  Size size_;
  Index startIndex_;
};

// ---------------------------------------------------------- SubmapIterator

class SubmapIterator {
 public:
  SubmapIterator(const GridMap& gridMap, const BufferRegion& bufferRegion)
      : size_(gridMap.getSize()),
        submapStartIndex_(bufferRegion.getStartIndex()),
        submapSize_(bufferRegion.getSize()),
        submapIndex_(0, 0),
        pastEnd_(submapSize_(0) == 0 || submapSize_(1) == 0) {
    updateIndex();
  }

  bool isPastEnd() const { return pastEnd_; }
  const Index& operator*() const { return index_; }

  SubmapIterator& operator++() {
    // row-major over the submap (dim 1 fastest), wrap in buffer space
    if (submapIndex_(1) + 1 < submapSize_(1)) {
      ++submapIndex_(1);
    } else if (submapIndex_(0) + 1 < submapSize_(0)) {
      submapIndex_(1) = 0;
      ++submapIndex_(0);
    } else {
      pastEnd_ = true;
      return *this;
    }
    updateIndex();
    return *this;
  }

 private:
  void updateIndex() {
    if (pastEnd_) return;
    index_ = submapStartIndex_ + submapIndex_;
    wrapIndexToRange(index_, size_);
  }

  Size size_;
  Index submapStartIndex_;
  Size submapSize_;
  Index submapIndex_;
  Index index_;
  bool pastEnd_;
};

}  // namespace grid_map
